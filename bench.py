"""Headline benchmark: full reference workload (N=1024, 100 CN timesteps,
converged to the reference tolerance 1e-6) on one TPU chip.

Baseline: the reference's only committed benchmark — 6.57 s for the same
workload at its best OpenMP configuration (8 threads, strong_scale.txt:8;
31.42 s serial).  vs_baseline = baseline_seconds / our_seconds (higher is
better).

Flagship configuration (the TPU-native fast path):
  * padded (8,128)-tile layout (core/layout.py)
  * f32 V-cycle compute + f64 iterative refinement (mg/refine.py) — certifies
    the reference's double-precision tol=1e-6 contract
  * cross-step fused stepper (timestepper_refined_fused): one emulated-f64
    fine-grid stencil pass per step serves the CN opening AND the previous
    step's certificate
  * fused Pallas red–black smoother (backend="auto" resolves to it on TPU —
    measured winner at every size, RESULTS.md)
  * fixed cycle count (scan-only program, no data-dependent while loops —
    the axon compiler pathology) with the residual certificate in stats
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
    uT, stats = model.run()
    # block_until_ready() is a no-op on the axon platform — force a host
    # transfer of one element to synchronize with device completion.
    np.asarray(jnp.ravel(uT)[-2])
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
        ),
    )
    run_once(model)  # compile + warm up
    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        uT, stats = run_once(model)
        times.append(time.perf_counter() - t0)
    secs = min(times)
    center = float(uT[512, 512])
    max_rel = float(np.asarray(stats["rel_residual"]).max())
    result = {
        "metric": "full_run_n1024_100steps",
        "value": round(secs, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_N1024_S / secs, 2),
        "detail": {
            "device": str(jax.devices()[0]),
            "config": "f32 cycles + f64 refinement, fused stepper, pallas "
                      "smoother (auto), fixed 1 cycle/step, dense coarse",
            "center_uT": center,
            "max_rel_residual": max_rel,
            "meets_reference_tol_1e-6": max_rel <= REFERENCE_TOL,
            "baseline": "strong_scale.txt:8 (8-thread OMP, 6.57 s)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
