"""Grid-level hierarchy: the Level pytree and its constructor.

The reference builds "towers" of raw pointers per level inside `timestepper`
(multigrid.cpp:130-160).  Here a level is an immutable pytree holding the
precomputed interior coefficient fields of its CN operator, so the cycle is a
pure function over a tuple of Levels (static depth → the V/W recursion unrolls
at trace time into one XLA program).

Divergence from the reference (intentional, SURVEY §2.9.1): the reference's
velocity restriction uses a loop-invariant size `ni = (n>>1)+1`
(multigrid.cpp:148-157), mis-sampling every level below the second; we restrict
each level from the previous one with the correct per-level size — the
behavior the code intended.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hpcclassmultigridproject_tpu.core.layout import pad_field, padded_shape
from hpcclassmultigridproject_tpu.core.problem import cn_coefficients_padded
from hpcclassmultigridproject_tpu.ops.padded import restrict_inject


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Level:
    """One grid level: (n+1)^2 nodes, h = 2^lvl / n_fine.

    All arrays use the TPU padded layout (core/layout.py): full padded shape
    `padded_shape(n)`, coefficients zero outside the open interior.
    Diagonals are python floats (compile-time constants — they depend only on
    dt, nu, h).
    """

    # data leaves
    aa: jnp.ndarray
    bb: jnp.ndarray
    cc: jnp.ndarray
    dd: jnp.ndarray
    v1: jnp.ndarray            # velocity fields kept for kernels that
    v2: jnp.ndarray            # recompute coefficients on the fly
    a_inv: Optional[jnp.ndarray]  # dense inverse of interior A (coarsest only)
    # Galerkin 9-point extension (sparse/galerkin.py): corner couplings and a
    # spatially-varying diagonal (None -> rediscretized 5-point level whose
    # diagonal is the compile-time scalar diag_a)
    ne: Optional[jnp.ndarray] = None   # couples u[i-1, j+1]
    nw: Optional[jnp.ndarray] = None   # couples u[i-1, j-1]
    se: Optional[jnp.ndarray] = None   # couples u[i+1, j+1]
    sw: Optional[jnp.ndarray] = None   # couples u[i+1, j-1]
    diag: Optional[jnp.ndarray] = None  # diagonal of A (1 outside interior)
    # static metadata
    n: int = _static(default=0)
    h: float = _static(default=0.0)
    dt: float = _static(default=0.0)
    nu: float = _static(default=0.0)
    diag_a: float = _static(default=1.0)
    diag_b: float = _static(default=1.0)

    @property
    def shape(self) -> tuple[int, int]:
        """Logical node-grid shape."""
        return (self.n + 1, self.n + 1)

    @property
    def padded(self) -> tuple[int, int]:
        """Padded storage shape (= the shape of every array in this level)."""
        return self.aa.shape


def dense_interior_matrix(level: Level) -> np.ndarray:
    """Assemble the dense interior operator A ((n-1)^2 x (n-1)^2), numpy.

    Row-major interior ordering p = (i-1)*(n-1) + (j-1).  Used for the exact
    coarse solve (the capability the reference abandoned in exact_solve.cpp)
    and as the oracle for the sparse/CSR path tests.
    """
    m = level.n - 1
    # crop the padded coefficient fields to the interior block (node (i,j) at
    # padded index [i,j] -> interior array index [i-1, j-1])
    nn = level.n
    aa = np.asarray(level.aa, dtype=np.float64)[1:nn, 1:nn]
    bb = np.asarray(level.bb, dtype=np.float64)[1:nn, 1:nn]
    cc = np.asarray(level.cc, dtype=np.float64)[1:nn, 1:nn]
    dd = np.asarray(level.dd, dtype=np.float64)[1:nn, 1:nn]
    A = np.zeros((m * m, m * m))
    idx = np.arange(m * m)
    A[idx, idx] = level.diag_a
    ii, jj = np.divmod(idx, m)
    north = ii >= 1          # couples interior (i-1, j)
    A[idx[north], idx[north] - m] = cc[ii[north], jj[north]]
    south = ii <= m - 2
    A[idx[south], idx[south] + m] = dd[ii[south], jj[south]]
    west = jj >= 1
    A[idx[west], idx[west] - 1] = aa[ii[west], jj[west]]
    east = jj <= m - 2
    A[idx[east], idx[east] + 1] = bb[ii[east], jj[east]]
    return A


def build_fine_level(
    v1: jnp.ndarray,
    v2: jnp.ndarray,
    dt: float,
    nu: float,
    dtype=jnp.float64,
) -> Level:
    """Build only the finest level's operator at `dtype` — the high-precision
    operator used by mixed-precision iterative refinement (mg/refine.py) for
    residuals and the CN right-hand side."""
    n = v1.shape[0] - 1
    h = 1.0 / n
    v1h = pad_field(jnp.asarray(v1, dtype))
    v2h = pad_field(jnp.asarray(v2, dtype))
    coef = cn_coefficients_padded(v1h, v2h, n, dt, nu, h)
    return Level(
        aa=coef.aa, bb=coef.bb, cc=coef.cc, dd=coef.dd,
        v1=v1h, v2=v2h, a_inv=None,
        n=n, h=h, dt=dt, nu=nu,
        diag_a=float(coef.diag_a), diag_b=float(coef.diag_b),
    )


def build_hierarchy(
    v1: jnp.ndarray,
    v2: jnp.ndarray,
    dt: float,
    nu: float,
    num_levels: int,
    dtype=jnp.float32,
    coarse_mode: str = "gs",
    coarse_operator: str = "rediscretize",
    restriction: str = "inject",
) -> tuple[Level, ...]:
    """Build the level tower from the finest velocity fields.

    Velocities are restricted downward once by injection (the reference's
    choice, multigrid.cpp:155-157, with the size bug fixed) — for node-sampled
    analytic fields injection is exact sampling at coarse nodes.

    coarse_operator "rediscretize" re-derives CN coefficients from the
    restricted velocities on every level (the reference's scheme);
    "galerkin" builds each coarse operator as the exact R·A·P product
    (sparse/galerkin.py — 9-point DIA levels; `restriction` selects R).
    """
    n = v1.shape[0] - 1
    levels = []
    v1l = pad_field(jnp.asarray(v1, dtype))
    v2l = pad_field(jnp.asarray(v2, dtype))
    for lvl in range(num_levels):
        nl = n >> lvl
        if nl < 2:
            raise ValueError(
                f"num_levels={num_levels} too deep for n={n} (level {lvl} has n={nl})"
            )
        h = 1.0 / n * (1 << lvl)
        if lvl > 0 and coarse_operator == "galerkin":
            from hpcclassmultigridproject_tpu.sparse.galerkin import (
                galerkin_coarse_level,
            )

            level = galerkin_coarse_level(levels[-1], restriction, v1l, v2l)
        else:
            coef = cn_coefficients_padded(v1l, v2l, nl, dt, nu, h)
            level = Level(
                aa=coef.aa, bb=coef.bb, cc=coef.cc, dd=coef.dd,
                v1=v1l, v2=v2l, a_inv=None,
                n=nl, h=h, dt=dt, nu=nu,
                diag_a=float(coef.diag_a), diag_b=float(coef.diag_b),
            )
        levels.append(level)
        if lvl + 1 < num_levels:
            shape_c = padded_shape(nl >> 1)
            v1l = restrict_inject(v1l, shape_c)
            v2l = restrict_inject(v2l, shape_c)

    if coarse_mode == "dense":
        from hpcclassmultigridproject_tpu.sparse.galerkin import (
            attach_dense_inverse,
        )

        levels[-1] = attach_dense_inverse(levels[-1])
    return tuple(levels)
