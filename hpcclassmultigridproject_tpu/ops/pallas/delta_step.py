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

# whole-step opening kernel band budget (see _fused_open_smooth)
_OPEN_SMOOTH_BUDGET = 6 * 1024 * 1024


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


# ---------------------------------------------------------------------------
# whole-step opening: accumulate + delta rhs + top-level PRE-SMOOTH in one
# kernel (VERDICT r4 next #8 — the last HBM lever of the flagship step)
# ---------------------------------------------------------------------------


def _kernel_open_smooth(bh, h, total_rows, cn_open, cn_sm, nsweeps, diag_a,
                        res_dec, *refs):
    """Combined kernel body: the opening of `_kernel` (TwoSum accumulate +
    difference-form rhs) followed by the fused smoother's zero-init
    red–black cascade + trailing residual (ops/pallas/smoother.py::_kernel,
    from_v form) — all expressions mirrored term for term so interpret mode
    is bit-identical to the separate kernels.

    Validity: rhs_δ lacks true neighbors at the window edges (depth 1),
    which COINCIDES with the zero-init cascade's own shrink (pass p is
    valid at rows ≥ p+1 because pass 0 already needs rhs at radius 0 and
    the zero iterate is exact everywhere), so the combined cascade keeps
    the smoother's exact validity formula; the trailing residual reaches
    depth 2·nsweeps+1 = 7 < h = 8.  True array edges are exempt as always
    (zero-fill is the truth there).
    """
    i = pl.program_id(0)
    first = i == 0
    last = i == pl.num_programs(0) - 1
    rows = bh + 2 * h
    cols = refs[0].shape[1]
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    start = jnp.maximum(i * jnp.int32(bh) - jnp.int32(h), jnp.int32(0))
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
    rr_c, h_c, nu_c, n_c = cn_open
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

    one_i = jnp.int32(1)
    nm1 = jnp.int32(n_c - 1)
    interior = ((g >= one_i) & (g <= nm1) & (c_idx >= one_i) & (c_idx <= nm1))
    mask = jnp.where(interior, dtype.type(1), zero)

    lap, di, dj = dform(hi2)
    lap_l, di_l, dj_l = dform(lo3)
    lap, di, dj = lap + lap_l, di + di_l, dj + dj_l
    rhs = (-(two_rnu * lap) - r_h * (v1 * di + v2 * dj)) * mask

    # --- zero-init red–black cascade (smoother.py::_kernel, from_v) ---
    rr_s, hh_s, nu_s, _ = cn_sm
    rr_sm = dtype.type(rr_s)
    hh = dtype.type(hh_s)
    nu_sm = dtype.type(nu_s)
    aa = rr_sm * (-v2 * hh + nu_sm) * mask
    bb = rr_sm * (v2 * hh + nu_sm) * mask
    cc = rr_sm * (-v1 * hh + nu_sm) * mask
    dd = rr_sm * (v1 * hh + nu_sm) * mask

    def nb(x):
        up, dn, lf, rt = shifts(x)
        return cc * up + dd * dn + aa * lf + bb * rt

    red = ((r_idx + c_idx) & jnp.int32(1)) == jnp.int32(0)
    inv_diag = dtype.type(1.0 / diag_a)
    u = jnp.zeros_like(rhs)
    for p in range(2 * nsweeps):
        color = red if p % 2 == 0 else jnp.logical_not(red)
        valid = ((r_idx >= jnp.int32(p + 1)) | first) & (
            (r_idx < jnp.int32(rows - (p + 1))) | last)
        upd = (rhs - nb(u)) * inv_diag
        u = jnp.where(color & valid, upd, u)
    res = rhs - dtype.type(diag_a) * u - nb(u)

    def _dec(x):
        return x.reshape(bh // 2, 2, cols)[:, 0, :]

    @pl.when(first)
    def _():
        refs[5][:] = hi2[0:bh, :]
        refs[6][:] = lo3[0:bh, :]
        refs[7][:] = rhs[0:bh, :]
        refs[8][:] = u[0:bh, :]
        r_c = res[0:bh, :]
        refs[9][:] = _dec(r_c) if res_dec else r_c

    @pl.when(jnp.logical_not(first))
    def _():
        refs[5][:] = hi2[h:h + bh, :]
        refs[6][:] = lo3[h:h + bh, :]
        refs[7][:] = rhs[h:h + bh, :]
        refs[8][:] = u[h:h + bh, :]
        r_c = res[h:h + bh, :]
        refs[9][:] = _dec(r_c) if res_dec else r_c


@functools.partial(
    jax.jit, static_argnames=("cn_open", "cn_sm", "nsweeps", "diag_a",
                              "res_dec"),
)
def _fused_open_smooth(hi, lo, d, v1, v2, *, cn_open, cn_sm, nsweeps,
                       diag_a, res_dec):
    rows, cols = hi.shape
    h = _sm._halo(nsweeps)
    # the 10-window working set needs its own band budget: under the
    # narrow-tier 4 MB the band drops to 72 rows (22% halo recompute of the
    # whole cascade) and the fusion measured a 1.2 ms/run LOSS at n=1024;
    # 6 MB restores ~104 rows while staying inside the calibrated-footprint
    # cap under Mosaic's default 16 MiB (no vmem_limit override — the clean
    # narrow-tier regime).  Wide/xwide rows keep the module budgets.
    budget = max(_sm._budget_for(cols * hi.dtype.itemsize),
                 _OPEN_SMOOTH_BUDGET)
    bh = _sm._pick_band(rows, cols, hi.dtype.itemsize, h, n_windows=10,
                        n_in=5, n_out=5, budget=budget)
    if res_dec:
        if bh < 16:
            out = _fused_open_smooth(
                hi, lo, d, v1, v2, cn_open=cn_open, cn_sm=cn_sm,
                nsweeps=nsweeps, diag_a=diag_a, res_dec=False,
            )
            return (*out[:4], out[4][::2, :][: rows // 2])
        bh = bh // 16 * 16
    footprint = _sm._assert_vmem_fit(bh, cols, hi.dtype.itemsize, h,
                                     n_in=5, n_out=5)
    grid = pl.cdiv(rows, bh)

    in_spec = pl.BlockSpec(
        (pl.Element(bh + 2 * h, (0, bh + 2 * h)), pl.Element(cols, (0, 0))),
        lambda i: (
            pl.multiple_of(
                jnp.maximum(i * jnp.int32(bh) - jnp.int32(h), jnp.int32(0)), 8
            ),
            jnp.int32(0),
        ),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (bh, cols), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
    )
    s = jax.ShapeDtypeStruct(hi.shape, hi.dtype)
    if res_dec:
        res_shape = jax.ShapeDtypeStruct((rows // 2, cols), hi.dtype)
        res_spec = pl.BlockSpec(
            (bh // 2, cols), lambda i: (i, jnp.int32(0)),
            memory_space=pltpu.VMEM,
        )
    else:
        res_shape, res_spec = s, out_spec
    return pl.pallas_call(
        functools.partial(_kernel_open_smooth, bh, h, rows, cn_open, cn_sm,
                          nsweeps, diag_a, res_dec),
        grid=(grid,),
        in_specs=[in_spec] * 5,
        out_specs=(out_spec, out_spec, out_spec, out_spec, res_spec),
        out_shape=(s, s, s, s, res_shape),
        interpret=_sm.INTERPRET,
        compiler_params=_sm._compiler_params(footprint,
                                             cols * hi.dtype.itemsize),
    )(hi, lo, d, v1, v2)


def fused_open_presmooth(level, hi, lo, d, nsweeps,
                         residual_rows_decimated=False):
    """Whole-step opening: accumulate the pending correction, compute the
    delta rhs, AND run the top level's zero-init pre-smooth block (+
    trailing residual, optionally row-decimated) in ONE banded HBM pass —
    the separate opening + pre-smooth kernels re-read (rhs_δ, v1, v2), so
    fusing saves three full-grid reads and one launch per step.  rhs_δ is
    still materialized (the post-smooth and the certificate norm read it).

    Returns (hi2, lo2, rhs_δ, u1, r0[dec]).  5-point from_v levels only;
    numerics bit-identical to fused_accumulate_open + fused_rb_sweeps
    (tests/test_pallas.py)."""
    rr, half_h, nu, n = _sm.cn_params(level)
    return _fused_open_smooth(
        hi, lo, d, level.v1, level.v2,
        cn_open=(rr, level.h, nu, n), cn_sm=(rr, half_h, nu, n),
        nsweeps=nsweeps, diag_a=level.diag_a,
        res_dec=residual_rows_decimated,
    )
