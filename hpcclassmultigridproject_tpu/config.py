"""Configuration dataclasses.

The reference hard-codes every parameter in each `main` (multigrid.cpp:192-241:
N, maxlvl, nu, dt, T, tol, shape; NITER=3 at multigrid.cpp:41; MAX_CYCLE=50 at
:94; coarse-solve 1e-5/1000 at :60).  Here they are all first-class, with the
reference defaults reproduced exactly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """The 2-D advection–diffusion problem on [0,1]^2 with Dirichlet BCs.

    u_t + v·∇u + ν∇²u = 0 with ν passed negative (multigrid.cpp:235), i.e.
    physical diffusion |ν|.  Defaults reproduce the reference default problem
    (multigrid.cpp:192-241).
    """

    n: int = 256                  # finest grid: (n+1)^2 nodes, h = 1/n; power of 2
    nu: float = -4e-4             # diffusion parameter (negative by convention)
    x0: float = 0.2               # Gaussian IC center x (multigrid.cpp:206)
    y0: float = 0.4               # Gaussian IC center y
    sigma: float = 100.0          # Gaussian IC width
    kx: float = math.pi           # rotating-velocity wavenumbers (multigrid.cpp:208-209)
    ky: float = math.pi
    dt: Optional[float] = None    # default dx/10 (CFL, multigrid.cpp:238)
    num_steps: int = 100          # T = 100*dt (multigrid.cpp:239)

    @property
    def dx(self) -> float:
        return 1.0 / self.n

    @property
    def dt_(self) -> float:
        return self.dt if self.dt is not None else self.dx / 10.0


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Multigrid solver parameters (reference values cited per field)."""

    num_levels: Optional[int] = None  # default log2(n) - 4 (multigrid.cpp:193)
    cycle_shape: int = 1              # 1 = V-cycle, 2 = W-cycle (multigrid.cpp:35)
    niter: int = 3                    # pre/post smoothing sweeps (multigrid.cpp:41)
    tol: float = 1e-6                 # outer relative-residual tolerance (multigrid.cpp:240)
    max_cycles: int = 50              # MAX_CYCLE (multigrid.cpp:94)
    coarse_tol: float = 1e-5          # coarsest-level absolute residual (multigrid.cpp:60)
    coarse_maxiter: int = 1000        # coarsest-level GS iteration cap (multigrid.cpp:60)
    coarse_mode: str = "gs"           # "gs" (reference parity) | "dense" (precomputed
                                      # inverse, one MXU matmul — new capability, the
                                      # solve exact_solve.cpp:15 was abandoned at)
    smoother: str = "rbgs"            # "rbgs" (red-black GS) | "jacobi" (gs.cu:244
                                      # variant) | "chebyshev" (polynomial smoother —
                                      # new capability; decomposition-invariant, no
                                      # color masks; see ops/padded.py::chebyshev_smooth)
    jacobi_omega: float = 1.0         # weight for the Jacobi smoother (gs.cu:268 uses 1)
    cheby_degree: int = 3             # Chebyshev polynomial degree per "sweep"
    cheby_lower: float = 1.0 / 30.0   # smoothing band [lower, upper]·λ̂(D⁻¹A)
    cheby_upper: float = 1.1
    restriction: str = "inject"       # "inject" (reference, gs.cpp:283) | "full" (the
                                      # full-weighting variant left commented at gs.cpp:277-280)
    coarse_operator: str = "rediscretize"  # "rediscretize" (reference) | "galerkin" (RAP)
    dtype: jnp.dtype = jnp.float32
    backend: str = "auto"             # "auto" | "jnp" | "pallas"
    cycle_mode: str = "adaptive"      # "adaptive": outer lax.while_loop to tol, the
                                      # reference mg_outer semantics (multigrid.cpp:108).
                                      # "fixed": exactly `num_cycles` cycles per solve —
                                      # the TPU fast path (scan-only program; the
                                      # residual certificate is still computed in stats).
                                      # "fmg": full multigrid / nested iteration — coarse-
                                      # to-fine opening + `num_cycles` cycles per level
                                      # (mg/cycle.py::fmg_solve; new capability)
    num_cycles: int = 2               # cycles per solve in fixed mode
    refine_dtype: Optional[jnp.dtype] = None
                                      # mixed-precision iterative refinement: when set
                                      # (e.g. float64), u/rhs/residuals live in this
                                      # dtype and each cycle solves the error equation
                                      # A e = r in `dtype` — reference-accuracy (1e-6)
                                      # convergence certificates with f32 compute for
                                      # all the heavy smoothing work
    delta_form: bool = False          # delta (incremental) CN stepping (mg/delta.py):
                                      # solve A·δ = dt·L·u in `dtype` (f32) and
                                      # accumulate u += δ in `refine_dtype` — zero
                                      # high-precision stencil work per step; requires
                                      # refine_dtype set and cycle_mode="fixed"
    slim_hi_operator: Optional[bool] = None
                                      # store the high-precision (refine_dtype)
                                      # fine operator as velocities only,
                                      # recomputing coefficients on the fly
                                      # (bit-identical in f64).  None = auto:
                                      # slim at n >= 8192, where the six f64
                                      # coefficient arrays would cost 3.3+ GB
                                      # of HBM for a few certificate stencils
    sharded_overlap: bool = False     # rows-sharded fused smoothing: hide the
                                      # deep-halo ICI round behind the halo-
                                      # independent interior kernel (three
                                      # pallas launches — interior + two edge
                                      # slabs — instead of one; pays ~4·halo
                                      # rows of redundant compute to take the
                                      # exchange latency off the critical
                                      # path; parallel/pallas_halo.py and the
                                      # ICI model in RESULTS.md round 4)
    certify_every: int = 0            # delta mode: every k-th step additionally
                                      # recomputes the step's TRUE residual in
                                      # refine_dtype inside the scan (one emulated-
                                      # f64 stencil pass per k steps) — the rigorous
                                      # mid-run certificate (the f32 delta-scale
                                      # certificate alone can stay green while the
                                      # true residual fails, RESULTS.md round 2).
                                      # 0 = final step only (the f64 epilogue)

    def __post_init__(self):
        _check = {
            "cycle_mode": ("adaptive", "fixed", "fmg"),
            "smoother": ("rbgs", "jacobi", "chebyshev"),
            "restriction": ("inject", "full"),
            "coarse_mode": ("gs", "dense"),
            "coarse_operator": ("rediscretize", "galerkin"),
            "backend": ("auto", "jnp", "pallas"),
        }
        for field, allowed in _check.items():
            val = getattr(self, field)
            if val not in allowed:
                raise ValueError(f"{field}={val!r} not in {allowed}")
        if self.delta_form and (
            self.refine_dtype is None or self.cycle_mode != "fixed"
        ):
            raise ValueError(
                "delta_form requires refine_dtype set and cycle_mode='fixed' "
                "(the f64 state accumulator and a static cycle count)"
            )

    def resolved_num_levels(self, n: int) -> int:
        if self.num_levels is not None:
            return self.num_levels
        # reference heuristic: maxlvl = log2(N) - 4 so the coarsest grid is 32^2
        # (multigrid.cpp:193; its comment says 16 but the math gives 32, SURVEY §2.9.6)
        lvl = int(math.log2(n)) - 4
        return max(lvl, 1)
