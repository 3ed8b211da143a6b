"""Crank–Nicolson timestepping: rhs = B·u^n, then solve A·u^{n+1} = rhs.

The reference's `timestepper` (multigrid.cpp:124-186) is a host loop; here it
is a `lax.scan` so the full run is one XLA program with zero host round-trips.

Solve-path dispatch (all combinations share the same cycle kernels):

  cycle_mode   refine_dtype   solver
  adaptive     None           mg_solve          (reference mg_outer semantics)
  fixed        None           mg_solve_fixed    (scan-only TPU fast path)
  adaptive     float64        refined_solve     (mixed-precision refinement)
  fixed        float64        refined_solve     (fast path + f64 certificate)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hpcclassmultigridproject_tpu.config import SolverConfig
from hpcclassmultigridproject_tpu.mg.cycle import fmg_solve, mg_solve, mg_solve_fixed
from hpcclassmultigridproject_tpu.mg.levels import Level
from hpcclassmultigridproject_tpu.mg.refine import refined_solve
from hpcclassmultigridproject_tpu.ops.padded import compute_rhs, rhs_and_residual0


def timestep(
    levels: tuple[Level, ...],
    u,
    cfg: SolverConfig,
    fine_hi: Level | None = None,
    shardings=None,
):
    """One CN step: compute_rhs (multigrid.cpp:167) + mg_outer (:169).

    With `fine_hi` (the finest operator in `cfg.refine_dtype`), the rhs and
    the solve run under mixed-precision iterative refinement (mg/refine.py).
    """
    if fine_hi is not None:
        rhs, r0 = rhs_and_residual0(fine_hi, u)
        return refined_solve(
            levels, fine_hi, u, rhs, cfg, shardings=shardings, r0=r0
        )
    rhs = compute_rhs(levels[0], u)
    if cfg.cycle_mode == "fixed":
        return mg_solve_fixed(levels, u, rhs, cfg, shardings=shardings)
    if cfg.cycle_mode == "fmg":
        return fmg_solve(levels, u, rhs, cfg, shardings=shardings)
    return mg_solve(levels, u, rhs, cfg, shardings=shardings)


def timestepper(
    levels: tuple[Level, ...],
    u0: jnp.ndarray,
    num_steps: int,
    cfg: SolverConfig,
    fine_hi: Level | None = None,
    shardings=None,
):
    """Run `num_steps` CN steps; returns (uT, per-step stats pytree)."""

    def step(u, _):
        u, stats = timestep(levels, u, cfg, fine_hi=fine_hi, shardings=shardings)
        return u, stats

    return jax.lax.scan(step, u0, None, length=num_steps)
