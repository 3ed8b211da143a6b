"""A/B the whole-step opening fusion (VERDICT r4 next #8) on-chip.

One process, alternating configs: the N=1024 flagship delta workload with
mg/delta.py::_FUSE_OPEN_SMOOTH off (round-4 arrangement: separate opening
kernel + top-level pre-smooth) vs on (accumulate + delta rhs + pre-smooth
in ONE banded kernel — saves three full-grid reads + one launch per step).
Appends rows to bench_data/openfuse.jsonl.

Usage: python -u scripts/ab_openfuse_tpu.py [--n 1024] [--reps 7]
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
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
    from hpcclassmultigridproject_tpu.models import AdvectionDiffusion
    import hpcclassmultigridproject_tpu.mg.delta as mdelta

    print(f"device: {jax.devices()[0]}", flush=True)

    def build(fuse):
        mdelta._FUSE_OPEN_SMOOTH = fuse
        m = AdvectionDiffusion(
            ProblemConfig(n=args.n),
            SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64,
                         tol=1e-6, cycle_mode="fixed", num_cycles=1,
                         coarse_mode="dense", delta_form=True,
                         certify_every=10),
        )
        uT, st = m.run(warn=False)
        np.asarray(jnp.ravel(uT)[-2])
        return m

    models = {"plain": build(False), "openfuse": build(True)}
    best = {k: 9e9 for k in models}
    for _ in range(args.reps):
        for k, m in models.items():
            t0 = time.perf_counter()
            uT, st = m.run(warn=False)
            np.asarray(jnp.ravel(uT)[-2])
            best[k] = min(best[k], time.perf_counter() - t0)
    out = os.path.join(_REPO_ROOT, "bench_data", "openfuse.jsonl")
    for k, m in models.items():
        uT, st = m.run(warn=False)
        rels_hi = np.asarray(st["rel_residual_hi_steps"])
        row = {
            "config": k, "n": args.n, "best_s": round(best[k], 4),
            "center_uT": float(uT[args.n // 2, args.n // 2]),
            "max_rel_residual_f64_certified": float(
                rels_hi[rels_hi >= 0].max()),
            "final_rel_residual_f64": float(
                np.asarray(st["final_rel_residual_hi"])),
            "device": str(jax.devices()[0]),
            "timestamp": datetime.datetime.now().isoformat(
                timespec="seconds"),
        }
        with open(out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
