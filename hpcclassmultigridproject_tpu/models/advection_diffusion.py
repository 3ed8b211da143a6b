"""Flagship problem family: 2-D advection–diffusion with CN multigrid.

Bundles problem setup + hierarchy + solver into one object, replacing the
reference driver `main` (multigrid.cpp:188-293).  The default configuration is
the reference default problem (Gaussian IC at (0.2, 0.4), rotating velocity
field, nu = -4e-4, dt = dx/10, 100 steps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hpcclassmultigridproject_tpu.config import ProblemConfig, SolverConfig
from hpcclassmultigridproject_tpu.core.layout import crop_field, pad_field
from hpcclassmultigridproject_tpu.core.problem import gaussian_u0, rotating_velocity
from hpcclassmultigridproject_tpu.mg.levels import (
    Level,
    build_fine_level,
    build_hierarchy,
)
from hpcclassmultigridproject_tpu.mg.timestepper import timestep, timestepper


class AdvectionDiffusion:
    """End-to-end advection–diffusion solver.

    >>> model = AdvectionDiffusion(ProblemConfig(n=256), SolverConfig())
    >>> uT, stats = model.run()
    """

    def __init__(
        self,
        problem: ProblemConfig = ProblemConfig(),
        solver: SolverConfig = SolverConfig(),
    ):
        self.problem = problem
        self.solver = solver
        p, s = problem, solver
        self.num_levels = s.resolved_num_levels(p.n)
        v1, v2 = rotating_velocity(p.n, p.kx, p.ky, dtype=s.dtype)
        self.levels: tuple[Level, ...] = build_hierarchy(
            v1, v2, p.dt_, p.nu, self.num_levels,
            dtype=s.dtype, coarse_mode=s.coarse_mode,
            coarse_operator=s.coarse_operator, restriction=s.restriction,
        )
        if s.refine_dtype is not None:
            if jnp.dtype(s.refine_dtype).itemsize == 8 and not jax.config.jax_enable_x64:
                raise RuntimeError(
                    "refine_dtype=float64 requires jax.config.update('jax_enable_x64', True) "
                    "before building the model (otherwise JAX silently downcasts to f32)"
                )
            vh1, vh2 = rotating_velocity(p.n, p.kx, p.ky, dtype=s.refine_dtype)
            # slim (velocities-only) high-precision operator at large n:
            # six f64 coefficient arrays would cost 3.3 GB at n=8192 /
            # 13 GB at n=16384 for a few certificate stencils per run
            slim = s.slim_hi_operator
            if slim is None:
                slim = p.n >= 8192
            self.fine_hi: Level | None = build_fine_level(
                vh1, vh2, p.dt_, p.nu, dtype=s.refine_dtype,
                store_coefficients=not slim,
            )
            self.u0 = pad_field(
                gaussian_u0(p.n, p.x0, p.y0, p.sigma, dtype=s.refine_dtype)
            )
        else:
            self.fine_hi = None
            self.u0 = pad_field(
                gaussian_u0(p.n, p.x0, p.y0, p.sigma, dtype=s.dtype)
            )

    @functools.cached_property
    def _jit_run(self):
        nsteps, cfg = self.problem.num_steps, self.solver

        n = self.problem.n

        def run(levels, fine_hi, u0):
            uT, stats = timestepper(levels, u0, nsteps, cfg, fine_hi=fine_hi)
            return crop_field(uT, n), stats

        return jax.jit(run)

    @functools.cached_property
    def _jit_step(self):
        cfg = self.solver

        def step(levels, fine_hi, u):
            return timestep(levels, u, cfg, fine_hi=fine_hi)

        return jax.jit(step)

    def run(self, u0: jnp.ndarray | None = None, warn: bool = True):
        """Full timestepped run; returns (uT, per-step stats).

        With `warn`, emits the reference's non-convergence warning
        (multigrid.cpp:117-119, with its off-by-one fixed — SURVEY §2.9.5)
        when any step fails to reach tol.  The check transfers the per-step
        stats to host, so pass warn=False in timing loops.
        """
        uT, stats = self._jit_run(
            self.levels, self.fine_hi, self.u0 if u0 is None else u0
        )
        if warn:
            import warnings

            import numpy as np

            conv = np.asarray(stats["converged"])
            if not conv.all():
                bad = int(np.argmin(conv))
                warnings.warn(
                    f"multigrid did not converge at step {bad}: relative "
                    f"residual {float(np.asarray(stats['rel_residual'])[bad]):.3e}"
                    f" > tol {self.solver.tol:g}"
                )
            if "certified" in stats:
                cert = np.asarray(stats["certified"])
                if not cert.all():
                    bad = int(np.argmin(cert))
                    warnings.warn(
                        f"delta-form rigorous certificate FAILED at step {bad}:"
                        " true high-dtype relative residual "
                        f"{float(np.asarray(stats['rel_residual_hi_steps'])[bad]):.3e}"
                        f" > tol {self.solver.tol:g} (certify_every="
                        f"{self.solver.certify_every})"
                    )
        return uT, stats

    def step(self, u: jnp.ndarray):
        """A single CN timestep; returns (u_next, stats)."""
        return self._jit_step(self.levels, self.fine_hi, u)

    def _jit_run_chunk(self, nsteps: int):
        cache = self.__dict__.setdefault("_chunk_cache", {})
        if nsteps not in cache:
            cfg = self.solver

            def run(levels, fine_hi, u):
                return timestepper(levels, u, nsteps, cfg, fine_hi=fine_hi)

            cache[nsteps] = jax.jit(run)
        return cache[nsteps]

    def run_chunk(self, u_padded: jnp.ndarray, nsteps: int):
        """`nsteps` CN steps from a padded state (checkpoint/resume driver,
        utils/checkpoint.py); returns (u_padded, stats)."""
        return self._jit_run_chunk(nsteps)(self.levels, self.fine_hi, u_padded)

    def pad(self, u_logical: jnp.ndarray) -> jnp.ndarray:
        """Embed a logical (n+1)^2 field into the padded layout."""
        return pad_field(u_logical)

    def crop(self, u_padded: jnp.ndarray) -> jnp.ndarray:
        """Extract the logical (n+1)^2 field from a padded state."""
        return crop_field(u_padded, self.problem.n)

    def center_value(self, uT: jnp.ndarray) -> float:
        """uT[N/2][N/2] — the convergence oracle printed by the CUDA driver
        (multigrid.cu:258); measured reference values in BASELINE.md."""
        return float(uT[self.problem.n // 2, self.problem.n // 2])
