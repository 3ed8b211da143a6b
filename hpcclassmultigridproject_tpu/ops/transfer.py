"""Inter-grid transfer operators: restriction and prolongation.

Grid sizes: fine (2n+1)x(2n+1) ↔ coarse (n+1)x(n+1); coarse node (I, J) is
coincident with fine node (2I, 2J).
"""

from __future__ import annotations

import jax.numpy as jnp


def restrict_inject(fine: jnp.ndarray) -> jnp.ndarray:
    """Injection restriction: coarse[I, J] = fine[2I, 2J] (gs.cpp:283)."""
    return fine[::2, ::2]


def restrict_full_weighting(fine: jnp.ndarray) -> jnp.ndarray:
    """Full-weighting restriction with the 1/16 [1 2 1; 2 4 2; 1 2 1] stencil.

    The reference left this as commented-out code (gs.cpp:277-280); it is a
    first-class mode here.  Interior coarse nodes get the 9-point average;
    boundary coarse nodes fall back to injection (they are Dirichlet nodes).
    """
    c = fine[::2, ::2]
    # 9-point weighted average for interior coarse nodes
    center = fine[2:-2:2, 2:-2:2]
    edges = (
        fine[1:-2:2, 2:-2:2]
        + fine[3::2, 2:-2:2]
        + fine[2:-2:2, 1:-2:2]
        + fine[2:-2:2, 3::2]
    )
    corners = (
        fine[1:-2:2, 1:-2:2]
        + fine[1:-2:2, 3::2]
        + fine[3::2, 1:-2:2]
        + fine[3::2, 3::2]
    )
    interior = (4.0 * center + 2.0 * edges + corners) * (1.0 / 16.0)
    return c.at[1:-1, 1:-1].set(interior)


def prolong_bilinear(coarse: jnp.ndarray) -> jnp.ndarray:
    """Bilinear prolongation (n+1)^2 → (2n+1)^2 (gs.cpp:228-266, gs.cu:63-81).

    Coincident fine nodes copy the coarse value; edge-midpoint nodes average
    the two adjacent coarse values; cell-center nodes average the four
    surrounding coarse values.  This single vectorized scatter covers the
    reference's interior loop, its right/bottom border pass and the corner.
    """
    n = coarse.shape[0] - 1
    m = 2 * n + 1
    fine = jnp.zeros((m, m), dtype=coarse.dtype)
    fine = fine.at[::2, ::2].set(coarse)
    fine = fine.at[1::2, ::2].set(0.5 * (coarse[:-1, :] + coarse[1:, :]))
    fine = fine.at[::2, 1::2].set(0.5 * (coarse[:, :-1] + coarse[:, 1:]))
    fine = fine.at[1::2, 1::2].set(
        0.25
        * (coarse[:-1, :-1] + coarse[1:, :-1] + coarse[:-1, 1:] + coarse[1:, 1:])
    )
    return fine
