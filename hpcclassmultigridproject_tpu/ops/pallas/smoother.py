"""Fused red–black Gauss–Seidel Pallas kernel.

The jnp smoother (ops/padded.py) costs one full HBM round-trip of
(u, rhs, aa, bb, cc, dd) per COLOR PASS — 14 array-traffics per sweep, 42 for
the reference's 3-sweep pre/post smooth (multigrid.cpp:41).  This kernel fuses
all `nsweeps` sweeps (both colors) and optionally the trailing residual into
ONE pass over HBM: every array is read once per band, the sweeps run entirely
in VMEM, and u (+res) is written once — ~6x less memory traffic for the
dominant cost of the V-cycle.

Exact reference semantics (the gs.cu:389-391 kernel-launch barrier between
colors) are preserved across band boundaries by halo recomputation (temporal
blocking): each band loads an H-row halo on each side (overlapping
`pl.Element` windows) and recomputes the sweep cascade over a validity region
that shrinks by one row per color pass, so the final center rows carry
exactly the values a global barrier schedule would produce.
H = ceil((2·nsweeps+1)/8)·8 covers the dependency radius of the cascade plus
the trailing residual and keeps (8,128) f32 tile alignment.

Mosaic does not support low Element padding, so the first band's window is
clamped to start at row 0; the validity shrink is exempted at true array
edges (correct because everything outside the open interior has zero
coefficients — the padded-layout invariant, core/layout.py).  Window rows
past the end of the array are zeroed in-kernel by a global-row mask so
uninitialized padding (potentially NaN) cannot leak through 0·NaN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flip for CPU-based testing of the kernel (tests/test_pallas.py).
INTERPRET = False

# Input-window working-set target.  TPU v5e has 128 MiB of VMEM; XLA's
# DEFAULT scoped-vmem cap is only 16 MiB, which forced short bands (and made
# taller ones fail nondeterministically across remote-compile helpers, the
# "intermittent 21.2 M" of round 2's first sweep).  The kernel now raises the
# cap explicitly (`vmem_limit_bytes` below), so bands are sized by the REAL
# budget: taller bands amortize the 2h-row halo recompute (at the old 4 MB /
# 6-window setting, n=4096 bands were 24 rows against 16 halo rows — 1.67x
# traffic).  Swept on-chip (RESULTS.md round-2 band table).
_VMEM_BUDGET = 32 * 1024 * 1024

# Explicit scoped-VMEM cap handed to Mosaic.  Leaves headroom below the
# 128 MiB physical VMEM for XLA's own scratch; the kernel's true footprint
# (2x double-buffered input windows + 2x output bands + temporaries) stays
# well under this by construction of _pick_band.
_VMEM_LIMIT = 100 * 1024 * 1024


def _halo(nsweeps: int) -> int:
    """Halo rows per side: dependency radius 2·nsweeps (+1 for the residual),
    rounded up to the 8-row f32 sublane tile."""
    return -(-(2 * nsweeps + 1) // 8) * 8


def _pick_band(rows: int, cols: int, itemsize: int, h: int,
               n_in: int = 6, n_out: int = 2) -> int:
    """Largest multiple-of-8 band height whose pipeline working set —
    2x double-buffered input windows of (bh+2h) rows plus 2x double-buffered
    output bands — fits the VMEM budget (temporaries ride the headroom
    between _VMEM_BUDGET and _VMEM_LIMIT)."""
    per_row_in = 2 * n_in * cols * itemsize
    per_row_out = 2 * n_out * cols * itemsize
    bh = ((_VMEM_BUDGET - per_row_in * 2 * h) // (per_row_in + per_row_out)
          ) // 8 * 8
    bh = max(8, min(bh, -(-rows // 8) * 8))
    return bh


def _kernel(nsweeps, bh, h, total_rows, diag_a, want_residual, cn, zero_init,
            *refs):
    # refs: with cn=None, (u, rhs, aa, bb, cc, dd) windows of shape
    # (bh+2h, cols); with cn=(rr, half_h, nu, n), (u, rhs, v1, v2) windows
    # and the CN coefficients are recomputed in-kernel (the reference's own
    # per-point strategy, gs.cpp:126-129 — on TPU it trades 2 HBM array
    # reads for a handful of free VPU flops).  With zero_init, the u window
    # is absent entirely (the sweep cascade starts from u = 0 — the coarse-
    # level correction solves and the delta opening all start from zero, so
    # skipping the read saves materializing + loading a zeros array).
    # Then outputs.
    i = pl.program_id(0)
    first = i == 0
    last = i == pl.num_programs(0) - 1
    rows = bh + 2 * h
    cols = refs[0].shape[1]
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    # int constants pinned to i32: under jax_enable_x64 a weak Python int
    # stages as i64 and Mosaic's i64→i32 convert rule recurses forever
    start = jnp.maximum(i * jnp.int32(bh) - jnp.int32(h), jnp.int32(0))
    g = start + r_idx
    exists = g < jnp.int32(total_rows)   # rows past the end -> zero (kills NaN)

    # NB: every constant below is pinned to the ref dtype — under
    # jax_enable_x64 a bare Python 0.0/0 becomes a weak f64/i64 that Mosaic
    # cannot lower (f64 convert recursion), so zeros are dtype-exact.
    dtype = refs[0].dtype
    zero = dtype.type(0)
    n_in = (6 if cn is None else 4) - (1 if zero_init else 0)
    fields = [jnp.where(exists, r[:], zero) for r in refs[:n_in]]
    if zero_init:
        fields = [jnp.zeros_like(fields[0])] + fields
    if cn is None:
        u, rhs, aa, bb, cc, dd = fields
    else:
        u, rhs, v1, v2 = fields
        rr_c, hh_c, nu_c, n_c = cn
        rr = dtype.type(rr_c)
        hh = dtype.type(hh_c)
        nu = dtype.type(nu_c)
        # open-interior mask in GLOBAL indices (core/layout.py invariant:
        # coefficients are zero outside [1:n, 1:n]); expression shape mirrors
        # mg/levels.py::_np_cn_coefficients for f64 bit-parity in tests
        one_i = jnp.int32(1)
        nm1 = jnp.int32(n_c - 1)
        interior = ((g >= one_i) & (g <= nm1)
                    & (c_idx >= one_i) & (c_idx <= nm1))
        mask = jnp.where(interior, dtype.type(1), zero)
        aa = rr * (-v2 * hh + nu) * mask
        bb = rr * (v2 * hh + nu) * mask
        cc = rr * (-v1 * hh + nu) * mask
        dd = rr * (v1 * hh + nu) * mask

    def nb(x):
        up = jnp.pad(x[:-1, :], ((1, 0), (0, 0)), constant_values=zero)
        dn = jnp.pad(x[1:, :], ((0, 1), (0, 0)), constant_values=zero)
        lf = jnp.pad(x[:, :-1], ((0, 0), (1, 0)), constant_values=zero)
        rt = jnp.pad(x[:, 1:], ((0, 0), (0, 1)), constant_values=zero)
        return cc * up + dd * dn + aa * lf + bb * rt

    # red = (i+j) even in GLOBAL indices; g parity == r_idx parity since the
    # window start is a multiple of 8
    red = ((r_idx + c_idx) & jnp.int32(1)) == jnp.int32(0)
    inv_diag = dtype.type(1.0 / diag_a)

    for p in range(2 * nsweeps):
        color = red if p % 2 == 0 else jnp.logical_not(red)
        # validity shrinks by one row per pass, except at true array edges
        # (the first band's window starts at row 0, the last band's window
        # covers the array end) where the stencil's zero-fill IS the truth
        valid = ((r_idx >= jnp.int32(p + 1)) | first) & (
            (r_idx < jnp.int32(rows - (p + 1))) | last)
        upd = (rhs - nb(u)) * inv_diag
        u = jnp.where(color & valid, upd, u)

    # center offset inside the window: 0 for the first band (clamped window),
    # h otherwise — two static slices under pl.when (Mosaic has no value
    # dynamic_slice)
    res = rhs - diag_a * u - nb(u) if want_residual else None

    @pl.when(first)
    def _():
        refs[n_in][:] = u[0:bh, :]
        if want_residual:
            refs[n_in + 1][:] = res[0:bh, :]

    @pl.when(jnp.logical_not(first))
    def _():
        refs[n_in][:] = u[h:h + bh, :]
        if want_residual:
            refs[n_in + 1][:] = res[h:h + bh, :]


@functools.partial(
    jax.jit,
    static_argnames=("nsweeps", "diag_a", "want_residual", "cn", "zero_init"),
)
def _fused(*arrays, nsweeps, diag_a, want_residual, cn=None, zero_init=False):
    # arrays: (u, rhs, fields...) — or (rhs, fields...) with zero_init —
    # where fields = (aa, bb, cc, dd) precomputed or (v1, v2) with cn set
    rows, cols = arrays[0].shape
    h = _halo(nsweeps)
    n_in = len(arrays)
    bh = _pick_band(rows, cols, arrays[0].dtype.itemsize, h,
                    n_in=n_in, n_out=2 if want_residual else 1)
    grid = pl.cdiv(rows, bh)

    # overlapping element-offset windows: rows [max(i*bh-h, 0), +bh+2h)
    # index-map returns pinned to i32: under jax_enable_x64 a bare Python 0
    # stages as i64 and Mosaic cannot legalize the (i32, i64) map signature
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
    out_shape = jax.ShapeDtypeStruct(arrays[0].shape, arrays[0].dtype)
    if want_residual:
        out_shape = (out_shape, jax.ShapeDtypeStruct(arrays[0].shape, arrays[0].dtype))
        out_spec = (out_spec, out_spec)

    return pl.pallas_call(
        functools.partial(
            _kernel, nsweeps, bh, h, rows, diag_a, want_residual, cn, zero_init
        ),
        grid=(grid,),
        in_specs=[in_spec] * n_in,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*arrays)


def fused_rb_sweeps(level, u, rhs, nsweeps: int, want_residual: bool = False,
                    zero_init: bool = False):
    """`nsweeps` red–black GS sweeps (+ optional trailing residual) in one
    fused HBM pass.  Drop-in replacement for `nsweeps` calls of
    ops/padded.py::rb_gauss_seidel (+ one residual); see tests/test_pallas.py
    for the equivalence suite.

    CN levels built from velocity fields (level.cn_from_v) use the
    recomputed-coefficient kernel: the band windows read (u, rhs, v1, v2)
    instead of (u, rhs, aa, bb, cc, dd) — 25-30% less HBM traffic for the
    bandwidth-bound smoother, with the coefficient flops free on the VPU.

    `zero_init=True` declares u == 0 (correction solves, delta openings):
    the u window is dropped from the kernel inputs entirely, and `u` may be
    passed as None."""
    if getattr(level, "cn_from_v", False):
        cn = (
            0.5 * level.dt / (level.h * level.h),
            0.5 * level.h,
            level.nu,
            level.n,
        )
        fields = (level.v1, level.v2)
    else:
        cn = None
        fields = (level.aa, level.bb, level.cc, level.dd)
    arrays = (rhs, *fields) if zero_init else (u, rhs, *fields)
    out = _fused(
        *arrays, nsweeps=nsweeps, diag_a=level.diag_a,
        want_residual=want_residual, cn=cn, zero_init=zero_init,
    )
    return out if want_residual else (out, None)
