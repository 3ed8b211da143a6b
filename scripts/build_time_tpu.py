"""Measure model construction time on chip: host-numpy build vs the round-5
device (iota) build (VERDICT r4 next #3 'measure the n=8192 model build').

The host build is transfer-bound on the tunneled chip (~5 MB/s): round 4
measured ~776 s at n=8192.  The device build ships nothing — one jitted
program generates every level on device.  Appends rows to
bench_data/build_time.jsonl.

Usage: python -u scripts/build_time_tpu.py --n 4096 [--host-too]
(one n per invocation; --host-too only at sizes where the transfer wall is
affordable)
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
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--host-too", action="store_true")
    args = ap.parse_args()

    from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
    from hpcclassmultigridproject_tpu.models import AdvectionDiffusion

    out = os.path.join(_REPO_ROOT, "bench_data", "build_time.jsonl")
    print(f"device: {jax.devices()[0]}", flush=True)

    def build(device_build):
        t0 = time.perf_counter()
        m = AdvectionDiffusion(
            ProblemConfig(n=args.n),
            SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64,
                         tol=1e-6, cycle_mode="fixed", num_cycles=None,
                         coarse_mode="dense", delta_form=True,
                         device_build=device_build),
        )
        # the build is async on device; sync on the fine level's last bytes
        np.asarray(jnp.ravel(m.levels[0].aa)[-2:])
        np.asarray(jnp.ravel(m.u0)[-2:])
        dt = time.perf_counter() - t0
        row = {"n": args.n, "device_build": device_build,
               "build_s": round(dt, 2),
               "num_cycles_auto": m.solver.num_cycles,
               "device": str(jax.devices()[0]),
               "timestamp": datetime.datetime.now().isoformat(
                   timespec="seconds")}
        with open(out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
        return m

    m = build(True)
    # prove the device-built model actually solves: one step + certificate
    uT, st = m.run_chunk(m.u0, 1)
    np.asarray(jnp.ravel(uT)[-2:])
    print("one-step f32 cert:",
          float(np.asarray(st["rel_residual"]).max()), flush=True)
    del m
    if args.host_too:
        build(False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
