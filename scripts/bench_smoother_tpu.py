"""On-chip jnp-vs-Pallas smoother benchmark (VERDICT r1 item #1).

Measures the V-cycle's dominant cost — the 3-sweep red–black GS smooth block
with trailing residual (multigrid.cpp:41,69-72) — through both backends on
the real TPU.  Per-block time uses the two-loop-count difference method
(t(L2) - t(L1)) / (L2 - L1), which cancels the axon tunnel's per-dispatch
overhead (~25 ms — larger than the kernel itself at small n).

Appends one JSON line per (n, backend) to --out as it goes (the TPU tunnel
serializes clients; partial progress must survive a timeout), skipping
records already present.  The committed table lives in RESULTS.md and drives
the backend="auto" resolution (mg/cycle.py::_AUTO_PALLAS_MIN_N).

Run:  python -u scripts/bench_smoother_tpu.py --out bench_data/smoother.jsonl
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from hpcclassmultigridproject_tpu.core.layout import pad_field
from hpcclassmultigridproject_tpu.core.problem import rotating_velocity
from hpcclassmultigridproject_tpu.mg.levels import build_fine_level
from hpcclassmultigridproject_tpu.ops import padded as pops
from hpcclassmultigridproject_tpu.ops.pallas.smoother import fused_rb_sweeps

NSWEEPS = 3  # NITER, multigrid.cpp:41


def _sync(x):
    np.asarray(jnp.ravel(x)[-2])  # axon: block_until_ready is a no-op


def make_runner(block, loops):
    """Repeat the smooth block `loops` times under one jit program, keeping
    both outputs (u, residual) live so XLA cannot DCE the residual.

    `level` is an explicit jit argument: a closed-over level's coefficient
    arrays would be embedded as program constants, and at n=4096 the
    remote-compile request exceeds the tunnel's body-size limit."""

    @jax.jit
    def run(level, u, rhs):
        def body(carry, _):
            u, acc = carry
            u, res = block(level, u, rhs)
            return (u, acc + res[0, 0]), None

        (u, acc), _ = jax.lax.scan(
            body, (u, jnp.zeros((), u.dtype)), None, length=loops
        )
        return u, acc

    return run


def timed(run, level, u, rhs, reps):
    out, _ = run(level, u, rhs)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, _ = run(level, u, rhs)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,512,1024,2048,4096")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="bench_data/smoother.jsonl")
    args = ap.parse_args()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    done = set()
    if os.path.exists(args.out):
        for line in open(args.out):
            r = json.loads(line)
            if "backend" in r:
                done.add((r["n"], r["backend"]))
    sink = open(args.out, "a")

    def emit(rec):
        sink.write(json.dumps(rec) + "\n")
        sink.flush()
        print(json.dumps(rec), flush=True)

    emit({"device": str(jax.devices()[0]), "nsweeps": NSWEEPS})
    for n in (int(s) for s in args.sizes.split(",")):
        v1, v2 = rotating_velocity(n, dtype=jnp.float32)
        level = build_fine_level(v1, v2, (1.0 / n) / 10, -4e-4, dtype=jnp.float32)
        u = pad_field(jnp.zeros((n + 1, n + 1), jnp.float32).at[1:-1, 1:-1].set(1.0))
        rhs = jnp.zeros_like(u)
        # loop counts scale down with n^2 so runtime stays ~O(100 ms)
        l1 = max(4, (1024 // n) ** 2 * 16)
        l2 = 5 * l1

        def jnp_block(level, u, rhs):
            for _ in range(NSWEEPS):
                u = pops.rb_gauss_seidel(level, u, rhs)
            return u, pops.residual(level, u, rhs)

        def pallas_block(level, u, rhs):
            return fused_rb_sweeps(level, u, rhs, NSWEEPS, want_residual=True)

        # correctness cross-check (identical f32 arithmetic -> exact match)
        uj, _ = jax.jit(jnp_block)(level, u, rhs)
        up, _ = jax.jit(pallas_block)(level, u, rhs)
        err = float(jnp.max(jnp.abs(uj - up)))

        for name, block in (("jnp", jnp_block), ("pallas", pallas_block)):
            if (n, name) in done:
                continue
            t1 = timed(make_runner(block, l1), level, u, rhs, args.reps)
            t2 = timed(make_runner(block, l2), level, u, rhs, args.reps)
            per_block = (t2 - t1) / (l2 - l1)
            points = (n - 1) ** 2
            emit({
                "n": n, "backend": name, "loops": [l1, l2],
                "us_per_block": per_block * 1e6,
                "stencil_gdof_s": points * NSWEEPS / per_block / 1e9,
                "max_abs_diff_vs_jnp": err,
            })


if __name__ == "__main__":
    main()
