"""Fused delta-step opening kernel: state accumulation + delta rhs in one
HBM pass.

The delta stepper (mg/delta.py) begins every step with two bandwidth-bound
passes over the fine grid:

    hi', lo' = TwoSum-accumulate(hi, lo, d)        (apply last correction)
    rhs_δ    = (B − A)(hi' + lo')                  (difference-form opening)

Both read the state pair; the opening additionally needs only a ONE-cell
halo of the updated state — which is a pointwise function of the input
windows — so the two fuse into a single banded kernel: read
(hi, lo, d, v1, v2) once, write (hi', lo', rhs_δ) once.  ~30% less HBM
traffic for the step prologue plus one fewer kernel launch.

Same banding scheme as ops/pallas/smoother.py (overlapping 8-row-aligned
Element windows; band centers written, halo rows recomputed); the only
dependency radius is the opening's single cell, so the 8-row halo is ample.
Numerics are bit-identical to the separate mg/delta.py passes
(tests/test_pallas.py::test_fused_delta_open_matches_separate); the
difference-form expression mirrors mg/delta.py::delta_rhs term for term.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpcclassmultigridproject_tpu.ops.pallas import smoother as _sm

H = 8  # one 8-row tile covers the opening's 1-cell dependency radius


def _kernel(bh, total_rows, cn, *refs):
    # refs: (hi, lo, d, v1, v2) windows, then outputs (hi2, lo2, rhs_d)
    i = pl.program_id(0)
    first = i == 0
    rows = bh + 2 * H
    cols = refs[0].shape[1]
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    start = jnp.maximum(i * jnp.int32(bh) - jnp.int32(H), jnp.int32(0))
    g = start + r_idx
    exists = g < jnp.int32(total_rows)

    dtype = refs[0].dtype
    zero = dtype.type(0)
    hi, lo, d, v1, v2 = (jnp.where(exists, r[:], zero) for r in refs[:5])

    # --- TwoSum accumulate (mg/delta.py::_accumulate, bit-identical) ---
    t = hi + d
    bv = t - hi
    err = (hi - (t - bv)) + (d - bv)
    lo2 = lo + err
    hi2 = t + lo2
    lo3 = lo2 - (hi2 - t)

    # --- difference-form opening (mg/delta.py::delta_rhs, bit-identical) ---
    rr_c, h_c, nu_c, n_c = cn
    rr = float(rr_c)
    two_rnu = dtype.type(2.0 * rr * nu_c)
    r_h = dtype.type(rr * h_c)

    def shifts(x):
        up = jnp.pad(x[:-1, :], ((1, 0), (0, 0)), constant_values=zero)
        dn = jnp.pad(x[1:, :], ((0, 1), (0, 0)), constant_values=zero)
        lf = jnp.pad(x[:, :-1], ((0, 0), (1, 0)), constant_values=zero)
        rt = jnp.pad(x[:, 1:], ((0, 0), (0, 1)), constant_values=zero)
        return up, dn, lf, rt

    def dform(x):
        up, dn, lf, rt = shifts(x)
        lap = (up - x) + (dn - x) + (lf - x) + (rt - x)
        return lap, dn - up, rt - lf

    lap, di, dj = dform(hi2)
    lap_l, di_l, dj_l = dform(lo3)
    lap, di, dj = lap + lap_l, di + di_l, dj + dj_l
    one_i = jnp.int32(1)
    nm1 = jnp.int32(n_c - 1)
    interior = ((g >= one_i) & (g <= nm1) & (c_idx >= one_i) & (c_idx <= nm1))
    mask = jnp.where(interior, dtype.type(1), zero)
    rhs_d = (-(two_rnu * lap) - r_h * (v1 * di + v2 * dj)) * mask

    # window-edge rows of rhs_d lack true neighbors — but at true array
    # edges (first band top, beyond total_rows) the zero-fill IS correct;
    # interior band edges are overwritten by the neighboring band's center
    @pl.when(first)
    def _():
        refs[5][:] = hi2[0:bh, :]
        refs[6][:] = lo3[0:bh, :]
        refs[7][:] = rhs_d[0:bh, :]

    @pl.when(jnp.logical_not(first))
    def _():
        refs[5][:] = hi2[H:H + bh, :]
        refs[6][:] = lo3[H:H + bh, :]
        refs[7][:] = rhs_d[H:H + bh, :]


@functools.partial(jax.jit, static_argnames=("cn",))
def _fused_open(hi, lo, d, v1, v2, *, cn):
    rows, cols = hi.shape
    bh = _sm._pick_band(rows, cols, hi.dtype.itemsize, H, n_windows=8,
                        n_in=5, n_out=3)
    footprint = _sm._assert_vmem_fit(bh, cols, hi.dtype.itemsize, H,
                                     n_in=5, n_out=3)
    grid = pl.cdiv(rows, bh)

    in_spec = pl.BlockSpec(
        (pl.Element(bh + 2 * H, (0, bh + 2 * H)), pl.Element(cols, (0, 0))),
        lambda i: (
            pl.multiple_of(
                jnp.maximum(i * jnp.int32(bh) - jnp.int32(H), jnp.int32(0)), 8
            ),
            jnp.int32(0),
        ),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (bh, cols), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
    )
    s = jax.ShapeDtypeStruct(hi.shape, hi.dtype)
    return pl.pallas_call(
        functools.partial(_kernel, bh, rows, cn),
        grid=(grid,),
        in_specs=[in_spec] * 5,
        out_specs=(out_spec,) * 3,
        out_shape=(s, s, s),
        interpret=_sm.INTERPRET,
        compiler_params=_sm._compiler_params(footprint,
                                             cols * hi.dtype.itemsize),
    )(hi, lo, d, v1, v2)


def fused_accumulate_open(level, hi, lo, d):
    """Accumulate the pending correction into the (hi, lo) state pair and
    compute the next delta rhs, all in one banded HBM pass.  5-point CN
    levels with velocity fields only (level.cn_from_v).

    The rr factor comes from the shared smoother.cn_params helper (ADVICE
    r3 #4 — one source for the jit-cache-keyed coefficient constants); this
    kernel's difference form needs the FULL h (r·h·v terms, mg/delta.py),
    not cn_params' half_h."""
    rr, _, nu, n = _sm.cn_params(level)
    return _fused_open(hi, lo, d, level.v1, level.v2,
                       cn=(rr, level.h, nu, n))
