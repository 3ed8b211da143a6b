"""A/B the round-5 in-cycle coarse routing on tower-INELIGIBLE configs.

Round 4 measured that per-level banded Pallas on the coarse tower is ~6 ms
per flagship run WORSE than letting XLA fuse the jnp sub-tower (59.8 vs
53.6 ms) but only propagated the lesson to the tower path; W-cycles
(cycle_shape=2, a first-class reference mode — multigrid.cpp:35),
full weighting and Galerkin coarse operators kept the measured-worst
arrangement (VERDICT r4 weak #3 / next #2).  Round 5 added the
_AUTO_JNP_MAX_INCYCLE_N crossover (mg/cycle.py); this script prices it on
the configs it exists for, one full flagship-delta workload per config:

    W-cycle  (cycle_shape=2)          in-cycle jnp 512  vs  0 (round-4)
    full-weighting restriction        in-cycle jnp 512  vs  0

(The Galerkin pair lives in ab_galerkin_tpu.py.)  Appends rows to
bench_data/incycle.jsonl.

Usage: python -u scripts/ab_incycle_tpu.py [--n 1024] [--reps 5]
"""

import argparse
import datetime
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
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
    from hpcclassmultigridproject_tpu.models import AdvectionDiffusion
    from hpcclassmultigridproject_tpu.mg import cycle as cyc

    print(f"device: {jax.devices()[0]}", flush=True)

    def build(label, incyc, **solver_kw):
        cyc._AUTO_JNP_MAX_INCYCLE_N = incyc
        m = AdvectionDiffusion(
            ProblemConfig(n=args.n),
            SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64,
                         tol=1e-6, cycle_mode="fixed", num_cycles=1,
                         coarse_mode="dense", delta_form=True, **solver_kw),
        )
        uT, st = m.run(warn=False)
        np.asarray(jnp.ravel(uT)[-2])
        return m

    configs = [
        ("wcycle+incycle-jnp", 512, dict(cycle_shape=2)),
        ("wcycle+all-pallas(r4)", 0, dict(cycle_shape=2)),
        ("fullweight+incycle-jnp", 512, dict(restriction="full")),
        ("fullweight+all-pallas(r4)", 0, dict(restriction="full")),
    ]
    models = {lab: build(lab, ic, **kw) for lab, ic, kw in configs}
    best = {lab: 9e9 for lab in models}
    for _ in range(args.reps):
        for lab, m in models.items():
            t0 = time.perf_counter()
            uT, st = m.run(warn=False)
            np.asarray(jnp.ravel(uT)[-2])
            best[lab] = min(best[lab], time.perf_counter() - t0)
    out = os.path.join(_REPO_ROOT, "bench_data", "incycle.jsonl")
    for lab, m in models.items():
        uT, st = m.run(warn=False)
        row = {
            "config": lab, "n": args.n, "best_s": round(best[lab], 4),
            "center_uT": float(uT[args.n // 2, args.n // 2]),
            "final_rel_residual_f64": float(
                np.asarray(st["final_rel_residual_hi"])
            ),
            "device": str(jax.devices()[0]),
            "timestamp": datetime.datetime.now().isoformat(
                timespec="seconds"
            ),
        }
        with open(out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
