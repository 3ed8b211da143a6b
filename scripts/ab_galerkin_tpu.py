"""Price the Galerkin-coarse-operator configuration on-chip (round 4).

coarse_operator='galerkin' builds every coarse level as the exact RAP
product — 9-point operators with varying diagonals.  Round 3 left those
levels on the jnp smoother; round 4's nine-band fused kernel smooths them
in Pallas.  This script measures the full N=1024 flagship-delta workload
under (a) rediscretized coarse operators (production), (b) Galerkin with
the nine-band fused kernel, (c) Galerkin with the jnp fallback (floor
pushed above every coarse level) — quantifying both the Galerkin config's
total cost and what the nine-band kernel buys inside it.

Usage: python -u scripts/ab_galerkin_tpu.py [--n 1024] [--reps 5]
"""

import argparse
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

    def build(coarse_operator, floor):
        cyc._AUTO_PALLAS_MIN_N = floor
        m = AdvectionDiffusion(
            ProblemConfig(n=args.n),
            SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64,
                         tol=1e-6, cycle_mode="fixed", num_cycles=1,
                         coarse_mode="dense", delta_form=True,
                         coarse_operator=coarse_operator),
        )
        uT, st = m.run(warn=False)
        np.asarray(jnp.ravel(uT)[-2])
        return m

    # (label, coarse_operator, pallas floor)
    configs = [
        ("rediscretize(prod)", "rediscretize", 0),
        ("galerkin+9band", "galerkin", 0),
        ("galerkin+jnp-coarse", "galerkin", args.n),  # only the fine level fused
    ]
    models = {lab: build(op, fl) for lab, op, fl in configs}
    best = {lab: 9e9 for lab in models}
    for _ in range(args.reps):
        for lab, m in models.items():
            t0 = time.perf_counter()
            uT, st = m.run(warn=False)
            np.asarray(jnp.ravel(uT)[-2])
            best[lab] = min(best[lab], time.perf_counter() - t0)
    for lab, m in models.items():
        uT, st = m.run(warn=False)
        print("%-22s best %.4f s  center %.9e  f64cert %.2e" % (
            lab, best[lab], float(uT[args.n // 2, args.n // 2]),
            float(np.asarray(st["final_rel_residual_hi"]))), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
