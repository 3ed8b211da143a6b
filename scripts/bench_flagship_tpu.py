"""Flagship-workload backend comparison on the real TPU (VERDICT r1 item #1).

Runs the full headline benchmark (N=1024, 100 CN timesteps, f32 cycles + f64
refinement, fixed 1 cycle/step, dense MXU coarse — bench.py's configuration)
with the jnp smoother vs the fused Pallas smoother, and reports both plus the
certificate.  Appends JSON lines to --out.

Run:  python -u scripts/bench_flagship_tpu.py --out bench_data/flagship.jsonl
"""

import argparse
import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--backends", default="jnp,auto")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="bench_data/flagship.jsonl")
    args = ap.parse_args()

    from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
    from hpcclassmultigridproject_tpu.models import AdvectionDiffusion

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    sink = open(args.out, "a")

    def emit(rec):
        sink.write(json.dumps(rec) + "\n")
        sink.flush()
        print(json.dumps(rec), flush=True)

    emit({"device": str(jax.devices()[0]), "n": args.n})
    for backend in args.backends.split(","):
        model = AdvectionDiffusion(
            ProblemConfig(n=args.n),
            SolverConfig(
                dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
                backend=backend,
            ),
        )

        def run_once():
            uT, stats = model.run(warn=False)
            np.asarray(jnp.ravel(uT)[-2])  # sync (axon)
            return uT, stats

        run_once()  # compile + warm
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            uT, stats = run_once()
            times.append(time.perf_counter() - t0)
        emit({
            "backend": backend,
            "seconds": min(times),
            "center_uT": model.center_value(uT),
            "max_rel_residual": float(np.asarray(stats["rel_residual"]).max()),
            "vs_omp8_baseline": 6.57 / min(times),
        })


if __name__ == "__main__":
    main()
