"""Coarse-tower megakernel: the whole sub-V-cycle below a cutoff level in
TWO Pallas programs (+ the XLA dense coarse matmul between them).

Round-3 step decomposition (RESULTS.md): ~85 us of the ~300 us N=1024
flagship step is the coarse tower — launch-bound across ~25 tiny ops (one
pallas_call per smooth block, one XLA op per transfer, at levels whose
whole working set is a few hundred KB).  Everything at n<=256 fits in VMEM
at once, so the entire descent (smooth, residual, restrict, per level) runs
as ONE kernel, and the entire ascent (prolong, correct, smooth) as another;
only the coarsest dense solve stays outside (Mosaic cannot reshape (r,c) ->
(r*c,) for the vec() the precomputed-inverse matmul needs — probed on
hardware, scripts/mosaic_probe_tpu.py).

In-kernel primitives (each probed on the chip before this design):
  * smooth cascade: the fused kernel's red-black machinery on the FULL
    array (no banding, no validity shrink — true barrier semantics,
    ops/pallas/smoother.py contract) with in-kernel from_v coefficient
    recompute.
  * restriction rows: rank-3 reshape decimation x.reshape(R/2,2,C)[:,0,:]
    (sublane-stride slices and lane-dim reshapes do NOT lower in Mosaic).
  * restriction cols / prolongation cols: 0/1- and 0.5-weight matmuls at
    precision=HIGHEST — bit-exact vs the slice/interleave forms (probed),
    matching ops/padded.py's own MXU-decimation strategy (padded.py:263).
  * prolongation rows: stack+reshape interleave, the exact expressions of
    ops/padded.py::prolong_bilinear.

Numerics: every expression mirrors its ops/padded.py / smoother.py
counterpart term for term, so interpret mode is bit-identical to the
unfused cycle (tests/test_tower.py); on hardware the tower is a different
XLA program and carries the same few-ulp cross-program contract as the
banded kernel's cross-geometry drift.

Reference: this fuses multigrid.cpp:17-92's recursion below the cutoff —
the structure the reference pays ~25 kernel launches for in CUDA
(multigrid.cu:17-96).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpcclassmultigridproject_tpu.ops.pallas import smoother as _sm

# Levels with n <= this run inside the megakernel (trace-time).  On-chip
# A/B at the N=1024 flagship (round 4, /tmp tower sweep -> RESULTS.md):
#   no tower, all-pallas per-level (round-3 production): 59.8 / 64.3 ms
#   no tower, jnp below 512 (XLA-fused coarse tower):    53.6 / 54.0 ms
#   tower at 256:                                        55.0 / 57.7 ms
#   tower at 512 (whole sub-fine cycle in 2 kernels):    49.8 / 51.4 ms <-
# The 512 tower needs the 48 MiB scoped-VMEM override
# (_tower_compiler_params); results bit-identical to the per-level path on
# the chip at n=512 and n=1024.
TOWER_MAX_N = 512


def _col_decimate_matrix(fine_cols: int, coarse_cols: int) -> np.ndarray:
    """0/1 column-decimation matrix (ops/padded.py::_inject_cols_np)."""
    D = np.zeros((fine_cols, coarse_cols), np.float32)
    J = np.arange(coarse_cols)
    ok = 2 * J < fine_cols
    D[2 * J[ok], J[ok]] = 1.0
    return D


def _col_prolong_matrix(coarse_cols: int, fine_cols: int) -> np.ndarray:
    """Bilinear column-prolongation matrix P (coarse_cols x fine_cols):
    (y @ P)[:, 2J] = y[:, J], (y @ P)[:, 2J+1] = 0.5 (y[:, J] + y[:, J+1])
    — the matmul form of prolong_bilinear's column interleave, bit-exact
    at precision=HIGHEST (0.5 scaling commutes with f32 rounding;
    probed on hardware)."""
    P = np.zeros((coarse_cols, fine_cols), np.float32)
    J = np.arange(coarse_cols)
    even = 2 * J < fine_cols
    P[J[even], 2 * J[even]] = 1.0
    odd = 2 * J + 1 < fine_cols
    P[J[odd], 2 * J[odd] + 1] = 0.5
    nxt = (2 * J + 1 < fine_cols) & (J + 1 < coarse_cols)
    P[J[nxt] + 1, 2 * J[nxt] + 1] = 0.5
    return P


def _cn_fields(level, v1, v2, dtype):
    """In-kernel CN coefficient recompute (mirrors smoother.py::_kernel's
    from_v branch; rows here are global, so no row_off)."""
    rr_c, hh_c, nu_c, n_c = _sm.cn_params(level)
    rr = dtype.type(rr_c)
    hh = dtype.type(hh_c)
    nu = dtype.type(nu_c)
    zero = dtype.type(0)
    rows, cols = v1.shape
    r_idx = lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c_idx = lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    one_i = jnp.int32(1)
    nm1 = jnp.int32(n_c - 1)
    interior = ((r_idx >= one_i) & (r_idx <= nm1)
                & (c_idx >= one_i) & (c_idx <= nm1))
    mask = jnp.where(interior, dtype.type(1), zero)
    aa = rr * (-v2 * hh + nu) * mask
    bb = rr * (v2 * hh + nu) * mask
    cc = rr * (-v1 * hh + nu) * mask
    dd = rr * (v1 * hh + nu) * mask
    return aa, bb, cc, dd


def _nb(aa, bb, cc, dd, x, zero):
    """Neighbor sum via zero-padded shifts (smoother.py::_kernel::nb)."""
    up = jnp.pad(x[:-1, :], ((1, 0), (0, 0)), constant_values=zero)
    dn = jnp.pad(x[1:, :], ((0, 1), (0, 0)), constant_values=zero)
    lf = jnp.pad(x[:, :-1], ((0, 0), (1, 0)), constant_values=zero)
    rt = jnp.pad(x[:, 1:], ((0, 0), (0, 1)), constant_values=zero)
    return cc * up + dd * dn + aa * lf + bb * rt


def _cascade(level, coefs, u, rhs, nsweeps, dtype):
    """2*nsweeps red-black color passes on the full array — the banded
    kernel's cascade with every row valid (whole level in VMEM: the
    megakernel's analog of the single-band case)."""
    aa, bb, cc, dd = coefs
    zero = dtype.type(0)
    rows, cols = rhs.shape
    r_idx = lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c_idx = lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    red = ((r_idx + c_idx) & jnp.int32(1)) == jnp.int32(0)
    inv_diag = dtype.type(1.0 / level.diag_a)
    if u is None:
        u = jnp.zeros_like(rhs)
    for p in range(2 * nsweeps):
        color = red if p % 2 == 0 else jnp.logical_not(red)
        upd = (rhs - _nb(aa, bb, cc, dd, u, zero)) * inv_diag
        u = jnp.where(color, upd, u)
    return u


def _restrict_in_kernel(res, D, coarse_shape, dtype):
    """Injection restriction: rows by rank-3 reshape decimation, columns by
    the 0/1 matmul (both bit-exact vs ops/padded.py::_decimate)."""
    rows, cols = res.shape
    half = res.reshape(rows // 2, 2, cols)[:, 0, :]
    cr = coarse_shape[0]
    if half.shape[0] < cr:
        half = jnp.concatenate(
            [half, jnp.zeros((cr - half.shape[0], cols), dtype)], axis=0
        )
    else:
        half = half[:cr, :]
    return jnp.dot(half, D, precision=lax.Precision.HIGHEST)


def _prolong_in_kernel(coarse, P, fine_shape, dtype):
    """Bilinear prolongation: rows by the stack+reshape interleave (the
    exact ops/padded.py::prolong_bilinear row expressions), columns by the
    bilinear matmul."""
    zero = dtype.type(0)
    dn = jnp.pad(coarse[1:, :], ((0, 1), (0, 0)), constant_values=zero)
    rows_odd = dtype.type(0.5) * (coarse + dn)
    x = jnp.stack([coarse, rows_odd], axis=1).reshape(
        2 * coarse.shape[0], coarse.shape[1]
    )
    x = x[: fine_shape[0], :]
    return jnp.dot(x, P, precision=lax.Precision.HIGHEST)


def _descend_kernel(levels_meta, nsweeps, dtype, *refs):
    """Descent: for each level l = s..m: smooth from zero, residual,
    restrict to the next rhs.  refs layout:
      inputs:  rhs_s, (v1_l, v2_l) x (m-s+1), D_l x (m-s+1)
      outputs: u_l x (m-s+1), rhs_l for l = s+1..m, rhs_coarsest
    """
    levels = levels_meta
    k = len(levels)  # levels s..m
    v_refs = refs[1 : 1 + 2 * k]
    d_refs = refs[1 + 2 * k : 1 + 3 * k]
    out = refs[1 + 3 * k :]
    u_out = out[:k]
    rhs_out = out[k:]  # rhs_{s+1}..rhs_m, rhs_coarsest

    zero = dtype.type(0)
    rhs = refs[0][:]
    for i, (level, coarse_shape) in enumerate(levels):
        v1 = v_refs[2 * i][:]
        v2 = v_refs[2 * i + 1][:]
        coefs = _cn_fields(level, v1, v2, dtype)
        u = _cascade(level, coefs, None, rhs, nsweeps, dtype)
        u_out[i][:] = u
        aa, bb, cc, dd = coefs
        res = rhs - dtype.type(level.diag_a) * u - _nb(aa, bb, cc, dd, u, zero)
        rhs = _restrict_in_kernel(res, d_refs[i][:], coarse_shape, dtype)
        rhs_out[i][:] = rhs


def _ascend_kernel(levels_meta, nsweeps, dtype, *refs):
    """Ascent: for each level l = m..s: prolong the coarser solution, add,
    smooth.  refs layout:
      inputs:  u_coarsest, (u_l, rhs_l, v1_l, v2_l) x (m-s+1)
               [level order s..m], P_l x (m-s+1) [transition l+1 -> l]
      outputs: u_s
    """
    levels = levels_meta
    k = len(levels)
    lvl_refs = refs[1 : 1 + 4 * k]
    p_refs = refs[1 + 4 * k : 1 + 5 * k]
    u_out = refs[1 + 5 * k]

    v = refs[0][:]
    u_fine = None
    for i in range(k - 1, -1, -1):
        level, _ = levels[i]
        u_l = lvl_refs[4 * i][:]
        rhs_l = lvl_refs[4 * i + 1][:]
        v1 = lvl_refs[4 * i + 2][:]
        v2 = lvl_refs[4 * i + 3][:]
        corr = _prolong_in_kernel(v, p_refs[i][:], u_l.shape, dtype)
        coefs = _cn_fields(level, v1, v2, dtype)
        v = _cascade(level, coefs, u_l + corr, rhs_l, nsweeps, dtype)
    u_out[:] = v


def _vmem_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


# Temporary allowance in largest-level planes — the cascade's live
# intermediates at the top tower level (same role as smoother._TEMP_WINDOWS,
# re-used as the calibrated estimate; the megakernel's compile either fits
# or fails CLEANLY at AOT time with the exact footprint, round-3 finding).
_TOWER_TEMP_PLANES = _sm._TEMP_WINDOWS


def _tower_compiler_params(arrays, out_shapes, itemsize):
    """vmem_limit_bytes for a tower program: none while the modeled resident
    set (all refs + temporaries) fits Mosaic's 16 MiB default; the proven
    48 MiB cap when it doesn't (the n=512 tower).  Fails at trace time
    beyond that — raise TOWER_MAX_N only with a hardware smoke run."""
    total = sum(int(np.prod(a.shape)) for a in arrays) * itemsize
    total += sum(int(np.prod(s.shape)) for s in out_shapes) * itemsize
    biggest = max(int(np.prod(a.shape)) for a in arrays) * itemsize
    total += _TOWER_TEMP_PLANES * biggest
    if total <= _sm._DEFAULT_VMEM_LIMIT:
        return None
    if total <= _sm._VMEM_LIMIT:
        return pltpu.CompilerParams(vmem_limit_bytes=_sm._VMEM_LIMIT)
    raise ValueError(
        f"tower megakernel resident set {total / 2**20:.1f} MiB exceeds the "
        f"{_sm._VMEM_LIMIT / 2**20:.0f} MiB scoped-VMEM cap; lower "
        "TOWER_MAX_N (or validate a raised cap on hardware with "
        "scripts/smoke_tpu.py first)"
    )


class _LevelMeta:
    """Hashable static per-level metadata for the kernel closure (Levels
    themselves are pytrees of arrays and cannot be static args)."""

    def __init__(self, level):
        self.n = level.n
        self.h = level.h
        self.dt = level.dt
        self.nu = level.nu
        self.diag_a = level.diag_a

    def _key(self):
        return (self.n, self.h, self.dt, self.nu, self.diag_a)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, _LevelMeta) and self._key() == other._key()


@functools.lru_cache(maxsize=None)
def _transfer_mats(shapes_key):
    """(D, P) column matrices per transition, cached host-side."""
    Ds, Ps = [], []
    for fine_cols, coarse_cols in shapes_key:
        Ds.append(_col_decimate_matrix(fine_cols, coarse_cols))
        Ps.append(_col_prolong_matrix(coarse_cols, fine_cols))
    return Ds, Ps


def tower_vcycle(levels, s, rhs, cfg):
    """One V-cycle over levels[s:] with initial iterate zero, as
    descent-megakernel -> dense coarse matmul -> ascent-megakernel.

    Eligibility (checked by the caller, mg/cycle.py::_tower_eligible):
    cycle_shape == 1, zero initial iterate, all of levels[s:-1] 5-point
    cn_from_v, coarsest has a_inv, f32-family dtype.
    """
    from hpcclassmultigridproject_tpu.mg.cycle import coarse_solve_dense

    sub = levels[s:]
    mids = sub[:-1]           # levels that smooth (s..m)
    coarsest = sub[-1]
    k = len(mids)
    dtype = rhs.dtype
    nsweeps = cfg.niter

    metas = tuple(
        (_LevelMeta(l), nxt.padded)
        for l, nxt in zip(mids, sub[1:])
    )
    shapes_key = tuple(
        (l.padded[1], nxt.padded[1]) for l, nxt in zip(mids, sub[1:])
    )
    Ds_np, Ps_np = _transfer_mats(shapes_key)
    Ds = [jnp.asarray(D, dtype) for D in Ds_np]
    Ps = [jnp.asarray(P, dtype) for P in Ps_np]

    # ---- descent ----
    d_in = [rhs]
    for l in mids:
        d_in += [l.v1, l.v2]
    d_in += Ds
    d_out_shape = tuple(
        [jax.ShapeDtypeStruct(l.padded, dtype) for l in mids]
        + [jax.ShapeDtypeStruct(l.padded, dtype) for l in sub[1:]]
    )
    itemsize = jnp.dtype(dtype).itemsize
    descent = pl.pallas_call(
        functools.partial(_descend_kernel, metas, nsweeps, jnp.dtype(dtype)),
        out_shape=d_out_shape,
        in_specs=[_vmem_spec()] * len(d_in),
        out_specs=tuple([_vmem_spec()] * len(d_out_shape)),
        interpret=_sm.INTERPRET,
        compiler_params=_tower_compiler_params(d_in, d_out_shape, itemsize),
    )
    d_out = descent(*d_in)
    u_mids = d_out[:k]
    rhs_mids = (rhs,) + tuple(d_out[k : 2 * k - 1])
    rhs_bottom = d_out[2 * k - 1]

    # ---- coarsest dense solve (XLA: flatten + precomputed-inverse matmul,
    # the one op Mosaic cannot host) ----
    v = coarse_solve_dense(coarsest, jnp.zeros_like(rhs_bottom), rhs_bottom)

    # ---- ascent ----
    a_in = [v]
    for l, u_l, r_l in zip(mids, u_mids, rhs_mids):
        a_in += [u_l, r_l, l.v1, l.v2]
    a_in += Ps
    a_out_shape = jax.ShapeDtypeStruct(mids[0].padded, dtype)
    ascent = pl.pallas_call(
        functools.partial(_ascend_kernel, metas, nsweeps, jnp.dtype(dtype)),
        out_shape=a_out_shape,
        in_specs=[_vmem_spec()] * len(a_in),
        out_specs=_vmem_spec(),
        interpret=_sm.INTERPRET,
        compiler_params=_tower_compiler_params(a_in, [a_out_shape], itemsize),
    )
    return ascent(*a_in)
