"""A/B the coarse-tower smoother backend mix on-chip (round 4, VERDICT #1).

The round-3 step decomposition found ~85 us of the ~300 us N=1024 step in
the coarse tower, launch-bound across ~25 tiny ops — one pallas_call per
smooth block at every level (auto routes ALL sizes through the fused kernel,
measured fastest per-op in ISOLATION).  But isolated per-op wins ignore
launch/glue: many tiny sequential pallas launches defeat XLA's cross-op
fusion, which could otherwise collapse the whole jnp coarse tower into a
few fused kernels.  This script measures the FULL flagship run with the
pallas floor at several level cutoffs.

Usage: python -u scripts/ab_coarse_backend_tpu.py [--floors 0,128,256,512]
One process per floor is not needed (no VMEM-geometry change, only routing).
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
    ap.add_argument("--floors", default="0,128,256,512")
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
    from hpcclassmultigridproject_tpu.models import AdvectionDiffusion
    from hpcclassmultigridproject_tpu.mg import cycle as cyc

    print(f"device: {jax.devices()[0]}", flush=True)
    for floor in [int(f) for f in args.floors.split(",")]:
        cyc._AUTO_PALLAS_MIN_N = floor
        model = AdvectionDiffusion(
            ProblemConfig(n=args.n),
            SolverConfig(
                dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
                delta_form=True,
            ),
        )
        uT, stats = model.run(warn=False)
        np.asarray(jnp.ravel(uT)[-2])  # sync
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            uT, stats = model.run(warn=False)
            np.asarray(jnp.ravel(uT)[-2])
            times.append(time.perf_counter() - t0)
        center = float(uT[args.n // 2, args.n // 2])
        fin = float(np.asarray(stats["final_rel_residual_hi"]))
        print(
            f"floor={floor:5d}: best {min(times):.4f} s  med "
            f"{sorted(times)[len(times)//2]:.4f} s  center {center:.9e}  "
            f"f64cert {fin:.2e}", flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
