"""One certified sweep row (mg_timer.cu analog) with the rigorous f64
certificate recorded — round 4's envelope-extension runs (VERDICT r3 #2).

One (n, num_cycles) configuration per process (band geometries differ per
n).  Appends to bench_data/sweep_tpu_delta.jsonl in the cmd_sweep format
plus `num_cycles` and `final_rel_residual_f64`.

Why num_cycles matters at large n: the CN system's diagonal dominance is
4r|nu| = 8e-5 * n at the reference defaults (dt = h/10), so one V-cycle per
step stops sufficing once n is large — measured per-cycle contraction
~8.8e-5 at n=8192 (one cycle leaves 8.8e-5 > tol; two reach ~1e-9).  The
reference's adaptive outer loop (multigrid.cpp:108) would do exactly this
many cycles; the fixed-cycle sweep encodes it statically.

Usage: python -u scripts/sweep_row_tpu.py --n 8192 --num-cycles 2
"""

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--num-cycles", default=1,
                    type=lambda v: None if v == "auto" else int(v))
    ap.add_argument("--device-build", action="store_true",
                    help="device (iota) model build — no host transfer "
                         "(mg/levels.py::build_hierarchy_device; at n=8192 "
                         "the host build was a 776 s transfer wall)")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="bench_data/sweep_tpu_delta.jsonl")
    args = ap.parse_args()

    from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
    from hpcclassmultigridproject_tpu.models import AdvectionDiffusion

    print(f"device: {jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()
    model = AdvectionDiffusion(
        ProblemConfig(n=args.n, num_steps=args.steps),
        SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                     cycle_mode="fixed", num_cycles=args.num_cycles,
                     coarse_mode="dense", delta_form=True,
                     device_build=True if args.device_build else None),
    )
    build_s = time.perf_counter() - t0
    print(f"build {build_s:.0f}s", flush=True)
    t0 = time.perf_counter()
    uT, stats = model.run(warn=False)
    np.asarray(jnp.ravel(uT)[-2])
    print(f"compile+first {time.perf_counter() - t0:.0f}s", flush=True)
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        uT, stats = model.run(warn=False)
        np.asarray(jnp.ravel(uT)[-2])
        times.append(time.perf_counter() - t0)
    rec = {
        "n": args.n,
        "ms": min(times) * 1e3,
        "center_uT": model.center_value(uT),
        "max_rel_residual": float(np.asarray(stats["rel_residual"]).max()),
        "num_cycles": model.solver.num_cycles,
        "num_cycles_arg": "auto" if args.num_cycles is None else args.num_cycles,
        "device_build": bool(args.device_build),
        "final_rel_residual_f64": float(
            np.asarray(stats["final_rel_residual_hi"])),
        "build_s": round(build_s, 1),
    }
    print(json.dumps(rec), flush=True)
    with open(os.path.join(_REPO_ROOT, args.out), "a") as f:
        f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
