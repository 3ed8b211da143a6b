"""On-chip A/B for the fused add+smooth (corr=) post-smooth path
(VERDICT r2 item #9 — the megakernel experiment, narrowest-scope form).

Measures the full flagship run (N given, 100 steps, delta config) with the
cycle's prolong-add fusion ON vs OFF (mg/cycle.py::_FUSE_CORR), several
alternations to separate signal from tunnel jitter.

Usage: python -u scripts/ab_fusecorr_tpu.py --n 1024 --rounds 3 \
          --out bench_data/ab_fusecorr.jsonl
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


def _sync(x):
    np.asarray(jnp.ravel(x)[-2])


def build(n):
    from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
    from hpcclassmultigridproject_tpu.models import AdvectionDiffusion

    return AdvectionDiffusion(
        ProblemConfig(n=n),
        SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                     cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
                     delta_form=True),
    )


def run_once(model):
    uT, stats = model.run(warn=False)
    _sync(uT)
    return uT, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="bench_data/ab_fusecorr.jsonl")
    args = ap.parse_args()

    from hpcclassmultigridproject_tpu.mg import cycle as cyc

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    sink = open(args.out, "a")

    def emit(rec):
        sink.write(json.dumps(rec) + "\n")
        sink.flush()
        print(json.dumps(rec), flush=True)

    emit({"device": str(jax.devices()[0]), "n": args.n})
    models = {}
    for fuse in (True, False):
        cyc._FUSE_CORR = fuse
        models[fuse] = build(args.n)
        run_once(models[fuse])  # compile + warm
    centers = {}
    for r in range(args.rounds):
        for fuse in (True, False):
            cyc._FUSE_CORR = fuse  # no-op post-compile; kept for clarity
            m = models[fuse]
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                uT, stats = run_once(m)
                ts.append(time.perf_counter() - t0)
            centers[fuse] = float(uT[args.n // 2, args.n // 2])
            emit({"round": r, "fuse_corr": fuse, "best_s": round(min(ts), 5),
                  "times": [round(t, 5) for t in ts],
                  "final_hi": float(np.asarray(stats["final_rel_residual_hi"]))})
    emit({"center_fused": centers.get(True), "center_plain": centers.get(False),
          "centers_equal": centers.get(True) == centers.get(False)})
    return 0


if __name__ == "__main__":
    sys.exit(main())
