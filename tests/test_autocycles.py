"""Round-5 safety features: automatic cycle-count derivation (VERDICT r4
next #4), certificate-margin warnings, the slim-operator refined opening
(ADVICE r4 #1), the certify-cadence chunked unroll (VERDICT r4 weak #6),
and the in-cycle coarse backend routing (VERDICT r4 next #2).

The weak-dominance escalation tests exploit that the one-cycle residual is
controlled by the dominance parameter δ = 4r|ν| (r = dt/(2h²)), not by n
directly: δ = 0.655 — the value at which the n=8192 flagship measured a
FAILED 1-cycle certificate of 8.8e-5 on chip (RESULTS.md round 4) — is
reproduced at n=128 via ν, and the measured CPU residual (8.75e-5) matches
the chip's to within 1%.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
from hpcclassmultigridproject_tpu.models import AdvectionDiffusion


def _delta_solver(**kw):
    kw.setdefault("tol", 1e-6)
    return SolverConfig(
        dtype=jnp.float32, refine_dtype=jnp.float64, cycle_mode="fixed",
        coarse_mode="dense", delta_form=True, **kw,
    )


def test_resolved_num_cycles_matches_measured_choices():
    """The dominance model must reproduce every on-chip sweep decision
    (bench_data/sweep_tpu_delta.jsonl): 1 cycle at n<=2048, 2 at n=4096
    (measured 7.8e-7 — over tol/2) and n=8192, more at n=16384."""
    s = _delta_solver(num_cycles=None)
    picks = {}
    for n in (256, 1024, 2048, 4096, 8192, 16384):
        h = 1.0 / n
        picks[n] = s.resolved_num_cycles(h / 10.0, -4e-4, h)
    assert picks[256] == picks[1024] == picks[2048] == 1
    assert picks[4096] == 2
    assert picks[8192] == 2
    assert picks[16384] >= 3


def test_auto_cycles_escalates_at_weak_dominance():
    """δ = 0.655 (the n=8192 regime) at n=128: one cycle leaves the true
    f64 residual ~9e-5 >> tol; auto escalates to 2 and certifies."""
    p = ProblemConfig(n=128, nu=-0.0256, num_steps=10)  # δ = 4r|ν| = 0.655
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m1 = AdvectionDiffusion(p, _delta_solver(num_cycles=1))
        _, s1 = m1.run(warn=False)
        ma = AdvectionDiffusion(p, _delta_solver(num_cycles=None))
        _, sa = ma.run(warn=False)
    assert ma.solver.num_cycles == 2
    assert float(np.asarray(s1["final_rel_residual_hi"])) > 1e-6  # 1 FAILS
    assert float(np.asarray(sa["final_rel_residual_hi"])) <= 1e-6  # auto OK
    assert float(np.asarray(sa["rel_residual"]).max()) <= 5e-7  # with margin


def test_auto_cycles_default_problem_stays_one_cycle():
    """At the reference defaults the flagship must keep its 1-cycle fast
    path — auto may not regress the headline."""
    p = ProblemConfig(n=128, num_steps=5)
    m = AdvectionDiffusion(p, _delta_solver(num_cycles=None))
    assert m.solver.num_cycles == 1


def test_run_warns_when_f32_certificate_margin_thin():
    """A fixed cycle count whose f32 certificate exceeds tol/2 must warn
    (the n=4096-at-1-cycle situation, VERDICT r4 next #4 'at minimum')."""
    p = ProblemConfig(n=128, nu=-0.0256, num_steps=5)
    m = AdvectionDiffusion(p, _delta_solver(num_cycles=1, tol=1e-4))
    # tol=1e-4: converged=True per step (residual ~9e-5 <= tol) so the
    # non-convergence warning stays silent, but 9e-5 > tol/2 = 5e-5 — only
    # the margin warning fires
    with pytest.warns(UserWarning, match="no safety margin"):
        m.run()


def test_certify_every_outside_delta_warns():
    """certify_every is only honored by the delta stepper; requesting it
    elsewhere must not be silently ignored (ADVICE r4 #2)."""
    with pytest.warns(UserWarning, match="certify_every"):
        SolverConfig(certify_every=10)


def test_refined_opening_tolerates_slim_operator():
    """Non-delta refined stepping with a SLIM (velocities-only) fine_hi —
    the n>=8192 auto-slim configuration — must trace and run via the
    rhs_and_residual0_auto dispatch (ADVICE r4 #1: previously a trace-time
    TypeError on aa=None), and match the stored-coefficient build exactly
    (both openings are correctly-rounded f64 of the same expressions)."""
    p = ProblemConfig(n=64, num_steps=5)
    slim = AdvectionDiffusion(
        p, SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64,
                        cycle_mode="fixed", num_cycles=1,
                        slim_hi_operator=True),
    )
    assert slim.fine_hi.aa is None
    stored = AdvectionDiffusion(
        p, SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64,
                        cycle_mode="fixed", num_cycles=1,
                        slim_hi_operator=False),
    )
    uT_s, st_s = slim.run(warn=False)
    uT_f, st_f = stored.run(warn=False)
    np.testing.assert_array_equal(np.asarray(uT_s), np.asarray(uT_f))
    assert float(np.asarray(st_s["rel_residual"]).max()) <= 1e-6


def test_refined_adaptive_slim_traces():
    """The adaptive refined path (the CLI default with --refine) on a slim
    operator — the exact crash configuration of ADVICE r4 #1."""
    p = ProblemConfig(n=64, num_steps=2)
    m = AdvectionDiffusion(
        p, SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64,
                        slim_hi_operator=True),
    )
    _, st = m.run(warn=False)
    assert bool(np.asarray(st["converged"]).all())


def test_certify_chunked_unroll_matches_plain_and_cadence():
    """certify_every with MANY segments (the chunked-unroll regime,
    VERDICT r4 weak #6): trajectory bit-identical to the uncertified run,
    certificates exactly on the k·seg−1 cadence, none spurious."""
    p = ProblemConfig(n=32, num_steps=230)
    base = AdvectionDiffusion(p, _delta_solver(num_cycles=1))
    cert = AdvectionDiffusion(
        p, _delta_solver(num_cycles=1, certify_every=10)
    )
    uT_b, _ = base.run(warn=False)
    uT_c, st = cert.run(warn=False)  # nseg=23 -> 1 chunk of 16 + 7 unrolled
    np.testing.assert_array_equal(np.asarray(uT_b), np.asarray(uT_c))
    rels_hi = np.asarray(st["rel_residual_hi_steps"])
    assert rels_hi.shape == (230,)
    checked = rels_hi >= 0
    expected = np.zeros(230, bool)
    expected[np.arange(23) * 10 + 9] = True
    np.testing.assert_array_equal(checked, expected)
    assert rels_hi[checked].max() <= 1e-6
    assert bool(np.asarray(st["certified"]).all())


def test_incycle_auto_routing_mechanism_and_measured_default(monkeypatch):
    """The in-cycle coarse routing knob (VERDICT r4 next #2): with the
    crossover raised, auto routes in-cycle 5-point levels strictly below it
    to jnp — but NOT the level at the crossover, not Galerkin (nine-band)
    levels, not isolated blocks, and never explicit backend='pallas'.  The
    DEFAULT is 0 (routing off): the round-5 on-chip pricing refuted the
    round-4 hypothesis on every tower-ineligible config
    (bench_data/incycle.jsonl, galerkin.jsonl)."""
    import dataclasses

    import jax

    from hpcclassmultigridproject_tpu.mg import cycle as cyc
    from hpcclassmultigridproject_tpu.mg.levels import build_hierarchy
    from hpcclassmultigridproject_tpu.core.problem import rotating_velocity

    assert cyc._AUTO_JNP_MAX_INCYCLE_N == 0, (
        "default must stay 0 (per-level Pallas, the measured winner) unless "
        "re-priced on hardware via scripts/ab_incycle_tpu.py"
    )
    v1, v2 = rotating_velocity(1024, dtype=jnp.float32)
    levels = build_hierarchy(v1, v2, 1.0 / 10240, -4e-4, 6, dtype=jnp.float32)
    cfg = SolverConfig(dtype=jnp.float32, backend="auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fine, at512, coarse = levels[0], levels[1], levels[2]  # 1024, 512, 256
    # default: routing off — in_cycle makes no difference
    assert cyc._pallas_eligible(cfg, coarse, sharded=False, in_cycle=True)
    monkeypatch.setattr(cyc, "_AUTO_JNP_MAX_INCYCLE_N", 512)
    assert cyc._pallas_eligible(cfg, fine, sharded=False, in_cycle=True)
    assert cyc._pallas_eligible(cfg, at512, sharded=False, in_cycle=True)
    assert cyc._pallas_eligible(cfg, coarse, sharded=False, in_cycle=False)
    assert not cyc._pallas_eligible(cfg, coarse, sharded=False, in_cycle=True)
    # Galerkin (nine-band) levels are exempt (galerkin.jsonl round 5)
    nine = dataclasses.replace(coarse, ne=coarse.aa, nw=coarse.aa,
                               se=coarse.aa, sw=coarse.aa,
                               diag=coarse.aa)
    assert cyc._pallas_eligible(cfg, nine, sharded=False, in_cycle=True)
    # explicit backend='pallas' is never overridden by the in-cycle floor
    cfg_p = SolverConfig(dtype=jnp.float32, backend="pallas")
    assert cyc._pallas_eligible(cfg_p, coarse, sharded=False, in_cycle=True)
