"""Headline benchmark: full reference workload (N=1024, 100 CN timesteps,
V-cycle to tolerance) on one TPU chip.

Baseline: the reference's only committed benchmark — 6.57 s for the same
workload at its best OpenMP configuration (8 threads, strong_scale.txt:8;
31.42 s serial).  vs_baseline = baseline_seconds / our_seconds (higher is
better).

Prints ONE JSON line; pass --all for the extended suite (see cli.py bench).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


BASELINE_N1024_S = 6.57  # strong_scale.txt:8 (8-thread OMP, best)


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
        ProblemConfig(n=1024), SolverConfig(tol=1e-5, dtype=jnp.float32)
    )
    run_once(model)  # compile + warm up
    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        uT, stats = run_once(model)
        times.append(time.perf_counter() - t0)
    secs = min(times)
    center = float(uT[512, 512])
    result = {
        "metric": "full_run_n1024_100steps",
        "value": round(secs, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_N1024_S / secs, 2),
        "detail": {
            "device": str(jax.devices()[0]),
            "dtype": "float32",
            "center_uT": center,
            "max_cycles_per_step": int(jnp.max(stats["cycles"])),
            "baseline": "strong_scale.txt:8 (8-thread OMP, 6.57 s)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
