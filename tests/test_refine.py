"""Tests for the TPU fast-path solvers: fixed-cycle mode (scan-only programs)
and mixed-precision iterative refinement (mg/refine.py).

All run on CPU (conftest) where x64 is enabled; the refinement path is the
mechanism that lets f32 compute certify the reference's 1e-6 tolerance
(multigrid.cpp:240) — assertions here pin that certificate.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
from hpcclassmultigridproject_tpu.models import AdvectionDiffusion

CENTER = {64: 5.708e-5, 128: 5.080e-5}


def test_fixed_mode_matches_adaptive_f64():
    p = ProblemConfig(n=64, num_steps=20)
    m_ad = AdvectionDiffusion(p, SolverConfig(dtype=jnp.float64))
    m_fx = AdvectionDiffusion(
        p, SolverConfig(dtype=jnp.float64, cycle_mode="fixed", num_cycles=1)
    )
    uT_ad, s_ad = m_ad.run()
    uT_fx, s_fx = m_fx.run()
    # 1 cycle converges to ~1e-13 at defaults (SURVEY §0), so fixed(1) and
    # adaptive (which stops after 1 cycle) are the same algorithm
    assert int(np.asarray(s_ad["cycles"]).max()) == 1
    np.testing.assert_allclose(np.asarray(uT_fx), np.asarray(uT_ad), atol=1e-12)
    assert float(np.asarray(s_fx["rel_residual"]).max()) < 1e-10


def test_fixed_mode_dense_coarse_scan_only():
    """fixed + dense coarse solve = the zero-while_loop TPU program."""
    p = ProblemConfig(n=64, num_steps=10)
    m = AdvectionDiffusion(
        p,
        SolverConfig(
            dtype=jnp.float64, cycle_mode="fixed", num_cycles=1, coarse_mode="dense"
        ),
    )
    uT, stats = m.run()
    assert float(np.asarray(stats["rel_residual"]).max()) < 1e-10
    # and the program really contains no while loops
    import jax

    def run(levels, fine_hi, u0):
        from hpcclassmultigridproject_tpu.mg.timestepper import timestepper

        return timestepper(levels, u0, 10, m.solver, fine_hi=fine_hi)

    text = jax.jit(run).lower(m.levels, m.fine_hi, m.u0).as_text()
    # lax.scan itself lowers to one stablehlo.while (static trip count); the
    # point is that no *data-dependent* while loops remain: adaptive outer
    # loop + GS coarse solve would add two more
    assert text.count("stablehlo.while") == 1


@pytest.mark.slow
def test_refined_f32_certifies_1e6():
    """f32 cycles + f64 residuals reach the reference tolerance 1e-6 that
    pure f32 cannot certify (floor ~1.5e-5 relative at N=1024)."""
    p = ProblemConfig(n=128, num_steps=10)
    m = AdvectionDiffusion(
        p,
        SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6),
    )
    uT, stats = m.run()
    assert uT.dtype == jnp.float64
    assert bool(np.asarray(stats["converged"]).all())
    assert float(np.asarray(stats["rel_residual"]).max()) <= 1e-6
    assert int(np.asarray(stats["cycles"]).max()) <= 3


@pytest.mark.slow
def test_refined_fixed_mode_certificate():
    p = ProblemConfig(n=128, num_steps=10)
    m = AdvectionDiffusion(
        p,
        SolverConfig(
            dtype=jnp.float32,
            refine_dtype=jnp.float64,
            cycle_mode="fixed",
            num_cycles=2,
            coarse_mode="dense",
        ),
    )
    uT, stats = m.run()
    assert float(np.asarray(stats["rel_residual"]).max()) <= 1e-6


def test_refined_matches_f64_solution():
    """Refined f32/f64 full run lands within tol-scale error of the pure-f64
    run — the accuracy contract of iterative refinement."""
    p = ProblemConfig(n=64)
    m64 = AdvectionDiffusion(p, SolverConfig(dtype=jnp.float64))
    mrf = AdvectionDiffusion(
        p, SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6)
    )
    uT64, _ = m64.run()
    uTrf, _ = mrf.run()
    # refinement stops AT tol=1e-6 each step (the f64 solver overshoots to
    # ~1e-13), so the accumulated 100-step difference is O(100·tol·scale)
    np.testing.assert_allclose(np.asarray(uTrf), np.asarray(uT64), atol=5e-7)
    assert np.asarray(uTrf)[32, 32] == pytest.approx(CENTER[64], abs=1e-7)


def test_refined_requires_x64():
    import jax

    assert jax.config.jax_enable_x64  # conftest enables it; the guard only
    # fires when x64 is off, which we can't toggle per-test safely — the
    # constructor check is exercised implicitly by the tests above.


def test_wcycle_with_refinement():
    p = ProblemConfig(n=64, num_steps=5)
    m = AdvectionDiffusion(
        p,
        SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                     cycle_shape=2),
    )
    uT, stats = m.run()
    assert bool(np.asarray(stats["converged"]).all())


@pytest.mark.slow
def test_galerkin_with_refinement():
    p = ProblemConfig(n=64, num_steps=5)
    m = AdvectionDiffusion(
        p,
        SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                     coarse_operator="galerkin", restriction="full",
                     coarse_mode="dense", cycle_mode="fixed", num_cycles=2),
    )
    uT, stats = m.run()
    assert float(np.asarray(stats["rel_residual"]).max()) <= 1e-6


def test_fused_stepper_matches_per_step_refined():
    """The production fused stepper (timestepper_refined_fused, wired in by
    mg/timestepper.py for fixed+refined — VERDICT r1 weak #3) is numerically
    identical to per-step refined_solve calls: same iterates (the fusion only
    de-duplicates stencil passes) and same certificates."""
    p = ProblemConfig(n=64, num_steps=8)
    cfg = SolverConfig(
        dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
        cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
    )
    m = AdvectionDiffusion(p, cfg)
    # production path (routes through the fused stepper)
    uT_fused, s_fused = m.run()
    # per-step reference path: explicit timestep() loop
    u = m.u0
    rels = []
    for _ in range(p.num_steps):
        u, s = m.step(u)
        rels.append(float(np.asarray(s["rel_residual"])))
    uT_steps = m.crop(u)
    np.testing.assert_allclose(
        np.asarray(uT_fused), np.asarray(uT_steps), rtol=0, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(s_fused["rel_residual"]), np.asarray(rels), rtol=1e-5
    )
    assert bool(np.asarray(s_fused["converged"]).all())


def test_distributed_refined_matches_single():
    import numpy as _np

    from hpcclassmultigridproject_tpu.parallel import distributed_run, make_mesh

    p = ProblemConfig(n=64, num_steps=5)
    m = AdvectionDiffusion(
        p,
        SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6),
    )
    uT_single, _ = m.run()
    uT_dist, stats = distributed_run(m, make_mesh(), min_local=8)
    _np.testing.assert_allclose(
        _np.asarray(uT_dist), _np.asarray(uT_single), atol=1e-10
    )


def test_distributed_flagship_config_matches_single():
    """The EXACT headline bench configuration (bench.py: f32 cycles + f64
    refinement, fixed 1 cycle, dense coarse) over the 8-device mesh must
    match its single-device run (VERDICT r1 weak #6)."""
    from hpcclassmultigridproject_tpu.parallel import distributed_run, make_mesh

    p = ProblemConfig(n=64, num_steps=5)
    m = AdvectionDiffusion(
        p,
        SolverConfig(
            dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
            cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
        ),
    )
    uT_single, s1 = m.run()
    uT_dist, s2 = distributed_run(m, make_mesh(), min_local=8)
    np.testing.assert_allclose(
        np.asarray(uT_dist), np.asarray(uT_single), atol=1e-10
    )
    assert float(np.asarray(s2["rel_residual"]).max()) <= 1e-6


def test_fmg_with_refinement():
    """cycle_mode='fmg' + refinement: the first correction is a full FMG
    ascent; the certificate still reaches the reference tolerance."""
    p = ProblemConfig(n=64, num_steps=5)
    m = AdvectionDiffusion(
        p,
        SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                     cycle_mode="fmg", num_cycles=1, coarse_mode="dense"),
    )
    uT, stats = m.run()
    assert bool(np.asarray(stats["converged"]).all())
    assert float(np.asarray(stats["rel_residual"]).max()) <= 1e-6
    # same answer as the plain fixed-mode refined run
    m_fx = AdvectionDiffusion(
        p,
        SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                     cycle_mode="fixed", num_cycles=1, coarse_mode="dense"),
    )
    uT_fx, _ = m_fx.run()
    np.testing.assert_allclose(np.asarray(uT), np.asarray(uT_fx), atol=1e-9)


def test_delta_form_matches_f64_solution():
    """Delta (incremental) stepping (mg/delta.py): f32 increment solve +
    f64 state accumulation tracks the pure-f64 run to increment-rounding
    accuracy, and both the per-step f32 certificate and the epilogue's
    rigorous f64 certificate meet the reference tolerance."""
    p = ProblemConfig(n=64)
    m64 = AdvectionDiffusion(p, SolverConfig(dtype=jnp.float64))
    mdl = AdvectionDiffusion(
        p,
        SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                     cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
                     delta_form=True),
    )
    uT64, _ = m64.run()
    uTd, stats = mdl.run()
    assert uTd.dtype == jnp.float64
    np.testing.assert_allclose(np.asarray(uTd), np.asarray(uT64), atol=5e-7)
    assert np.asarray(uTd)[32, 32] == pytest.approx(CENTER[64], abs=1e-7)
    assert bool(np.asarray(stats["converged"]).all())
    assert float(np.asarray(stats["rel_residual"]).max()) <= 1e-6
    assert float(stats["final_rel_residual_hi"]) <= 1e-6


def test_delta_form_requires_fixed_and_refine():
    with pytest.raises(ValueError):
        SolverConfig(delta_form=True)
    with pytest.raises(ValueError):
        SolverConfig(delta_form=True, refine_dtype=jnp.float64,
                     cycle_mode="adaptive")


def test_delta_form_distributed_matches_single():
    """Delta-form stepping under the 8-device mesh (block-sharded f32-pair
    state) matches the single-device delta run."""
    from hpcclassmultigridproject_tpu.parallel import distributed_run, make_mesh

    p = ProblemConfig(n=64, num_steps=5)
    cfg = SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                       cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
                       delta_form=True)
    m = AdvectionDiffusion(p, cfg)
    uT_single, s1 = m.run()
    uT_dist, s2 = distributed_run(m, make_mesh(), min_local=8)
    np.testing.assert_allclose(
        np.asarray(uT_dist), np.asarray(uT_single), atol=1e-10
    )
    assert float(s2["final_rel_residual_hi"]) <= 1e-6


def test_delta_accumulators_agree():
    """The pure-f32 TwoSum accumulator (production) matches the register-f64
    reference accumulator bitwise on representative data — proves IEEE f32
    exactness of the error-free transformation survives compilation."""
    from hpcclassmultigridproject_tpu.mg.delta import (
        _accumulate,
        _accumulate_via_hi,
        _split_hi_lo,
    )

    rng = np.random.default_rng(7)
    x64 = jnp.asarray(rng.standard_normal((64, 128)))
    hi, lo = _split_hi_lo(x64, jnp.float32)
    d = jnp.asarray(rng.standard_normal((64, 128)) * 1e-3, jnp.float32)
    h1, l1 = _accumulate(hi, lo, d, jnp.float64)
    h2, l2 = _accumulate_via_hi(hi, lo, d, jnp.float64)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    # the lo parts may differ by <= 1 ulp of lo when the 3-term sum rounds
    # differently; the represented VALUE must agree to f64 rounding
    v1 = np.asarray(h1, np.float64) + np.asarray(l1, np.float64)
    v2 = np.asarray(h2, np.float64) + np.asarray(l2, np.float64)
    np.testing.assert_allclose(v1, v2, rtol=0, atol=1e-12)


def test_delta_form_wcycle():
    """delta_form composes with W-cycles (the fused certificate residual is
    emitted only on the final shape pass)."""
    p = ProblemConfig(n=64, num_steps=5)
    m = AdvectionDiffusion(
        p,
        SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                     cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
                     cycle_shape=2, delta_form=True),
    )
    uT, stats = m.run()
    assert bool(np.asarray(stats["converged"]).all())
    assert float(stats["final_rel_residual_hi"]) <= 1e-6


@pytest.mark.slow
def test_delta_certify_every_catches_poisoned_rhs():
    """Per-step rigorous certification (SolverConfig.certify_every, VERDICT
    r2 #6): every k-th step recomputes the TRUE high-dtype residual inside
    the scan.  A healthy difference-form rhs certifies ~7e-8; deliberately
    poisoning the rhs with the naive coefficient form (the cancellation-
    prone variant RESULTS.md measured failing tol while the f32 delta-scale
    certificate stayed green) is caught MID-RUN, not only by the final-step
    epilogue."""
    import hpcclassmultigridproject_tpu.mg.delta as delta_mod
    from hpcclassmultigridproject_tpu.ops.padded import neighbor_sum

    def make(certify_every=3):
        return AdvectionDiffusion(
            ProblemConfig(n=512, num_steps=10),
            SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64,
                         tol=1e-6, cycle_mode="fixed", num_cycles=1,
                         coarse_mode="dense", delta_form=True,
                         certify_every=certify_every),
        )

    # healthy difference-form rhs: all rigorous certificates pass
    _, stats = make().run(warn=False)
    rh = np.asarray(stats["rel_residual_hi_steps"])
    assert (rh >= 0).sum() == 3          # steps 2, 5, 8
    assert rh[rh >= 0].max() <= 1e-6
    assert bool(np.asarray(stats["certified"]).all())

    # poisoned: naive (diag_b - diag_a)*u - 2*nb_sum rhs, f32-cancellation
    def naive_rhs(level, u_hi, u_lo=None):
        u = u_hi if u_lo is None else u_hi + u_lo
        db_da = u.dtype.type(level.diag_b - level.diag_a)
        return db_da * u - 2.0 * neighbor_sum(level, u)

    orig = delta_mod.delta_rhs
    delta_mod.delta_rhs = naive_rhs
    try:
        _, stats_p = make().run(warn=False)
    finally:
        delta_mod.delta_rhs = orig
    rh_p = np.asarray(stats_p["rel_residual_hi_steps"])
    cert_p = np.asarray(stats_p["certified"])
    # the f32 delta-scale certificate STAYS green (the round-2 blind spot)...
    assert bool(np.asarray(stats_p["converged"]).all())
    # ...but the rigorous mid-run certificate catches it at the FIRST
    # certified step (step 2), 8 steps before the final epilogue would
    assert rh_p[2] > 1e-6
    assert not cert_p[2]
    with pytest.warns(UserWarning, match="rigorous certificate FAILED"):
        delta_mod.delta_rhs = naive_rhs
        try:
            make().run(warn=True)
        finally:
            delta_mod.delta_rhs = orig


def test_slim_hi_operator_is_bit_identical():
    """The velocities-only (slim) high-precision operator — aa..dd = None,
    coefficients recomputed via the *_auto dispatch (the n>=8192 HBM-saving
    form) — produces bit-identical runs and certificates: the from_v
    expressions mirror _np_cn_coefficients exactly in IEEE f64."""
    kw = dict(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
              cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
              delta_form=True, certify_every=2)
    p = ProblemConfig(n=128, num_steps=6)
    uT0, st0 = AdvectionDiffusion(
        p, SolverConfig(slim_hi_operator=False, **kw)).run(warn=False)
    m1 = AdvectionDiffusion(p, SolverConfig(slim_hi_operator=True, **kw))
    assert m1.fine_hi.aa is None          # actually slim
    uT1, st1 = m1.run(warn=False)
    np.testing.assert_array_equal(np.asarray(uT0), np.asarray(uT1))
    np.testing.assert_array_equal(
        np.asarray(st0["rel_residual_hi_steps"]),
        np.asarray(st1["rel_residual_hi_steps"]),
    )
    assert float(st0["final_rel_residual_hi"]) == float(
        st1["final_rel_residual_hi"]
    )
