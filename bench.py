"""Headline benchmark: full reference workload (N=1024, 100 CN timesteps,
converged to the reference tolerance 1e-6) on one TPU chip.

Baseline: the reference's only committed benchmark — 6.57 s for the same
workload at its best OpenMP configuration (8 threads, strong_scale.txt:8;
31.42 s serial).  vs_baseline = baseline_seconds / our_seconds (higher is
better).

Flagship configuration (the TPU-native fast path):
  * padded (8,128)-tile layout (core/layout.py)
  * delta-form stepping (mg/delta.py): the CN step increment A·δ = dt·L·u
    is computed and solved entirely in f32 (cancellation-free difference-
    form rhs), the state lives as an f32 (hi, lo) pair accumulated by
    error-free TwoSum — zero emulated-f64 stencil work per step, with both
    per-step f32 certificates and a rigorous f64 certificate of the final
    step in stats
  * fused Pallas red–black smoother with in-kernel coefficient recompute
    (backend="auto" resolves to it on TPU — measured winner at every size,
    RESULTS.md)
  * fixed cycle count (scan-only program, no data-dependent while loops —
    the axon compiler pathology)
  * dense MXU coarse solve (precomputed inverse — the solve the reference
    abandoned in exact_solve.cpp)

Prints ONE JSON line.
"""

import json
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


BASELINE_N1024_S = 6.57  # strong_scale.txt:8 (8-thread OMP, best)
REFERENCE_TOL = 1e-6     # multigrid.cpp:240


def run_once(model):
    # warn=False: the convergence-warning check fetches per-step stats —
    # multiple tunnel round-trips (~25 ms each) that would be timed;
    # convergence is asserted from stats after the timing loop instead.
    uT, stats = model.run(warn=False)
    # block_until_ready() is a no-op on the axon platform — synchronize by
    # fetching the f64 epilogue certificate, a SCALAR output that is the
    # program's final data-dependent sink (it derives from the full scan's
    # last state).  The previous jnp.ravel(uT)[-2] sync dispatched an extra
    # device program per rep — measured ~1 ms/rep of pure overhead
    # (same-process A/B, round 5).
    np.asarray(stats["final_rel_residual_hi"])
    return uT, stats


def main():
    from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
    from hpcclassmultigridproject_tpu.models import AdvectionDiffusion

    model = AdvectionDiffusion(
        ProblemConfig(n=1024),
        SolverConfig(
            dtype=jnp.float32,
            refine_dtype=jnp.float64,
            tol=REFERENCE_TOL,
            cycle_mode="fixed",
            num_cycles=1,
            coarse_mode="dense",
            delta_form=True,
            # rigorous (f64-operator) certification every 10th step, in
            # addition to the per-step f32 delta certificates and the final
            # f64 epilogue — the timed runs INCLUDE its cost (measured ~1%,
            # RESULTS.md round 4)
            certify_every=10,
        ),
    )
    run_once(model)  # compile + warm up
    run_once(model)  # second warm-up (tunnel round-trip spikes, see below)
    # the axon tunnel's round-trip shows multi-ms spikes (observed up to
    # +25 ms on isolated runs); min-of-N keeps the headline from being
    # hostage to one bad round trip (12 draws from a distribution whose
    # per-window floor varied 0.0527-0.074 s across one day, round 5)
    reps = 12
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        uT, stats = run_once(model)
        times.append(time.perf_counter() - t0)
    secs = min(times)
    # pipelined measurement: dispatch all reps back-to-back and sync ONCE —
    # amortizes the tunnel round-trip constant (~half the isolated wall
    # time on this link) across the batch, approximating what a directly
    # attached chip would measure.  Recorded in detail only; the primary
    # metric stays the isolated min-of-N for cross-round comparability.
    t0 = time.perf_counter()
    for _ in range(reps):
        uT_p, stats_p = model.run(warn=False)
    np.asarray(stats_p["final_rel_residual_hi"])
    pipelined = (time.perf_counter() - t0) / reps
    center = float(uT[512, 512])
    max_rel = float(np.asarray(stats["rel_residual"]).max())
    # mid-run rigorous certificates (every 10th step, f64 operator): -1
    # marks uncertified steps, so take the max over the certified ones
    rels_hi = np.asarray(stats["rel_residual_hi_steps"])
    max_rel_hi = float(rels_hi[rels_hi >= 0].max())
    result = {
        "metric": "full_run_n1024_100steps",
        "value": round(secs, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_N1024_S / secs, 2),
        "detail": {
            "device": str(jax.devices()[0]),
            # per-rep wall times: a spiky tunnel session is diagnosable
            # from the spread instead of silently eaten by min-of-9
            # (VERDICT r4 next #1a)
            "rep_times_s": [round(t, 4) for t in times],
            "pipelined_s_per_run": round(pipelined, 4),
            "config": "delta-form f32 steps + f32-pair state, pallas from_v "
                      "smoother (auto), fixed 1 cycle/step, dense coarse, "
                      "rigorous f64 certificate every 10th step",
            "center_uT": center,
            "max_rel_residual": max_rel,
            "max_rel_residual_f64_certified_steps": max_rel_hi,
            "final_rel_residual_f64": float(
                np.asarray(stats["final_rel_residual_hi"])
            ),
            "meets_reference_tol_1e-6": (
                max_rel <= REFERENCE_TOL and max_rel_hi <= REFERENCE_TOL
            ),
            "baseline": "strong_scale.txt:8 (8-thread OMP, 6.57 s)",
        },
    }
    print(json.dumps(result))
    # committed-data rule (VERDICT r3 weak #1 / r4 weak #1): every headline
    # measurement lands in bench_data/flagship.jsonl, not just the driver's
    # BENCH_r*.json snapshot
    try:
        import datetime
        import os

        row = dict(result)
        row["timestamp"] = datetime.datetime.now().isoformat(
            timespec="seconds"
        )
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_data", "flagship.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(row) + "\n")
    except OSError:
        pass  # read-only checkout: the printed line is still the record


if __name__ == "__main__":
    sys.exit(main())
