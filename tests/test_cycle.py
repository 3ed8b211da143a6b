"""Cycle- and solver-level tests: convergence, mode equivalence, W-cycles."""

import jax.numpy as jnp
import numpy as np
import pytest

from hpcclassmultigridproject_tpu import (
    ProblemConfig,
    SolverConfig,
    build_hierarchy,
    mg_solve,
)
from hpcclassmultigridproject_tpu.models import AdvectionDiffusion
from hpcclassmultigridproject_tpu.ops.padded import compute_rhs


def _setup(n=64, dtype=jnp.float64, **solver_kw):
    p = ProblemConfig(n=n)
    s = SolverConfig(dtype=dtype, **solver_kw)
    model = AdvectionDiffusion(p, s)
    rhs = compute_rhs(model.levels[0], model.u0)
    return model, rhs


def test_vcycle_converges_in_one_cycle():
    """At the default configuration one V-cycle reaches ~1e-13 relative
    residual (measured reference behavior, SURVEY §0)."""
    model, rhs = _setup()
    u, stats = mg_solve(model.levels, model.u0, rhs, model.solver)
    assert int(stats["cycles"]) == 1
    assert float(stats["rel_residual"]) < 1e-10
    assert bool(stats["converged"])


def test_wcycle_converges():
    model, rhs = _setup(cycle_shape=2)
    u, stats = mg_solve(model.levels, model.u0, rhs, model.solver)
    assert bool(stats["converged"])
    assert float(stats["rel_residual"]) < 1e-10


def test_dense_coarse_solve_matches_gs():
    m_gs, rhs = _setup(coarse_mode="gs")
    m_dn, _ = _setup(coarse_mode="dense")
    u_gs, s1 = mg_solve(m_gs.levels, m_gs.u0, rhs, m_gs.solver)
    u_dn, s2 = mg_solve(m_dn.levels, m_dn.u0, rhs, m_dn.solver)
    assert bool(s2["converged"])
    np.testing.assert_allclose(np.asarray(u_dn), np.asarray(u_gs), atol=1e-9)


def test_full_weighting_mode_converges():
    model, rhs = _setup(restriction="full")
    u, stats = mg_solve(model.levels, model.u0, rhs, model.solver)
    assert bool(stats["converged"])


def test_jacobi_smoother_converges():
    model, rhs = _setup(smoother="jacobi", jacobi_omega=0.8)
    u, stats = mg_solve(model.levels, model.u0, rhs, model.solver)
    assert bool(stats["converged"])


@pytest.mark.slow
def test_deep_hierarchy_converges():
    """More levels than the reference heuristic (coarsest 4x4)."""
    model, rhs = _setup(num_levels=5)  # n=64 -> coarsest 4
    u, stats = mg_solve(model.levels, model.u0, rhs, model.solver)
    assert bool(stats["converged"])


def test_float32_solver_converges():
    model, rhs = _setup(dtype=jnp.float32, tol=1e-5)
    u, stats = mg_solve(model.levels, model.u0, rhs, model.solver)
    assert bool(stats["converged"])
    assert u.dtype == jnp.float32


def test_nonconvergence_warning():
    """The reference's 'did not converge' warning (multigrid.cpp:117-119)
    with the off-by-one fixed: fires iff a step misses tol."""
    import warnings

    from hpcclassmultigridproject_tpu.models import AdvectionDiffusion

    model = AdvectionDiffusion(
        ProblemConfig(n=64, num_steps=3),
        SolverConfig(dtype=jnp.float64, tol=1e-30, max_cycles=2),
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        model.run()
    assert any("did not converge" in str(x.message) for x in w)

    model2 = AdvectionDiffusion(
        ProblemConfig(n=64, num_steps=3), SolverConfig(dtype=jnp.float64)
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        model2.run()
    assert not any("did not converge" in str(x.message) for x in w)


def test_chebyshev_smoother_converges():
    """Chebyshev polynomial smoother (new capability): mg_solve reaches the
    reference tolerance with no red-black masking anywhere in the cycle."""
    model, rhs = _setup(smoother="chebyshev")
    u, stats = mg_solve(model.levels, model.u0, rhs, model.solver)
    assert bool(stats["converged"])
    assert float(stats["rel_residual"]) < 1e-6


def test_chebyshev_smoother_alone_reduces_residual():
    """One Chebyshev application must contract the residual on its own
    (smoother property, independent of the cycle)."""
    from hpcclassmultigridproject_tpu.ops.padded import (
        chebyshev_smooth,
        interior_norm,
        residual,
    )

    model, rhs = _setup()
    lv = model.levels[0]
    r0 = float(interior_norm(residual(lv, model.u0, rhs)))
    u1 = chebyshev_smooth(lv, model.u0, rhs, degree=3)
    r1 = float(interior_norm(residual(lv, u1, rhs)))
    assert r1 < 0.2 * r0


def test_fmg_solve_converges():
    """FMG (nested iteration) reaches the reference tolerance with one cycle
    per level, starting from the zero-information coarse solve."""
    from hpcclassmultigridproject_tpu.mg.cycle import fmg_solve

    model, rhs = _setup(cycle_mode="fmg", num_cycles=1)
    u, stats = fmg_solve(model.levels, model.u0, rhs, model.solver)
    assert bool(stats["converged"])
    assert float(stats["rel_residual"]) < 1e-6


def test_fmg_matches_adaptive_solution():
    """The FMG solve and the adaptive reference-semantics solve agree to
    solver tolerance on the same system."""
    from hpcclassmultigridproject_tpu.mg.cycle import fmg_solve

    model, rhs = _setup()
    u_ref, _ = mg_solve(model.levels, model.u0, rhs, model.solver)
    m2, _ = _setup(cycle_mode="fmg", num_cycles=1)
    u_fmg, stats = fmg_solve(m2.levels, m2.u0, rhs, m2.solver)
    assert bool(stats["converged"])
    np.testing.assert_allclose(np.asarray(u_fmg), np.asarray(u_ref), atol=1e-8)


def test_tight_tolerance_f64_certificate():
    """tol=1e-8 in f64: the tol comparison must run in the accumulation dtype
    (an f32 downcast of the norms floors the measurable relative residual at
    ~1e-7 — VERDICT r1 item 9)."""
    model, rhs = _setup(tol=1e-8)
    u, stats = mg_solve(model.levels, model.u0, rhs, model.solver)
    assert bool(stats["converged"])
    rel = np.asarray(stats["rel_residual"])
    assert rel.dtype == np.float64
    assert float(rel) <= 1e-8


def test_solver_config_validation():
    """Unknown mode strings fail fast at construction, not silently at
    dispatch (ADVICE r1)."""
    import pytest

    for field, bad in [
        ("cycle_mode", "vcycle"),
        ("smoother", "sor"),
        ("restriction", "harmonic"),
        ("coarse_mode", "lu"),
        ("coarse_operator", "rap"),
        ("backend", "cuda"),
    ]:
        with pytest.raises(ValueError):
            SolverConfig(**{field: bad})


def test_fmg_timestepper_mode():
    """cycle_mode='fmg' plugs into the CN timestepper and tracks the oracle
    center value (N=64 -> 5.708e-5, SURVEY §0)."""
    p = ProblemConfig(n=64)
    s = SolverConfig(dtype=jnp.float64, cycle_mode="fmg", num_cycles=1)
    model = AdvectionDiffusion(p, s)
    uT, stats = model.run()
    assert bool(np.asarray(stats["converged"]).all())
    center = model.center_value(uT)
    np.testing.assert_allclose(center, 5.708e-5, rtol=1e-3)
