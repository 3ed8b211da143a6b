"""Crank–Nicolson timestepping: rhs = B·u^n, then solve A·u^{n+1} = rhs.

The reference's `timestepper` (multigrid.cpp:124-186) is a host loop; here it
is a `lax.scan` so the full run is one XLA program with zero host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hpcclassmultigridproject_tpu.config import SolverConfig
from hpcclassmultigridproject_tpu.mg.cycle import mg_solve
from hpcclassmultigridproject_tpu.mg.levels import Level
from hpcclassmultigridproject_tpu.ops.stencil import compute_rhs


def timestep(levels: tuple[Level, ...], u, cfg: SolverConfig, shardings=None):
    """One CN step: compute_rhs (multigrid.cpp:167) + mg_outer (:169)."""
    rhs = compute_rhs(levels[0], u)
    return mg_solve(levels, u, rhs, cfg, shardings=shardings)


def timestepper(
    levels: tuple[Level, ...],
    u0: jnp.ndarray,
    num_steps: int,
    cfg: SolverConfig,
    shardings=None,
):
    """Run `num_steps` CN steps; returns (uT, per-step stats pytree)."""

    def step(u, _):
        u, stats = timestep(levels, u, cfg, shardings=shardings)
        return u, stats

    return jax.lax.scan(step, u0, None, length=num_steps)
