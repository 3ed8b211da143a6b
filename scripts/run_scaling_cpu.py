"""Device-count scaling sweeps on the 8-virtual-device CPU mesh — the
fake-backend analog of the reference's thread sweep (multigrid_strongsc.cpp
:251-262).  Committed output: bench_data/scaling_{strong,weak}.jsonl.

Virtual CPU devices share the host cores, so these numbers pin the
*distribution logic* (shard correctness, reshard/agglomeration overhead
scaling), not chip performance; the real-chip headline is bench.py.

Run:  python -u scripts/run_scaling_cpu.py
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from hpcclassmultigridproject_tpu.cli import main  # noqa: E402


def run(mode: str, out: str, extra=()):
    import contextlib

    os.makedirs("bench_data", exist_ok=True)
    with open(out, "w") as f, contextlib.redirect_stdout(f):
        rc = main([
            "scaling", "--mode", mode, "--n", "256", "--steps", "10",
            "--dtype", "f64", "--max-devices", "8", "--reps", "2", *extra,
        ])
    assert rc == 0
    print(mode, "->", out, flush=True)
    for line in open(out):
        print("  ", line.strip())


if __name__ == "__main__":
    run("strong", "bench_data/scaling_strong.jsonl")
    run("weak", "bench_data/scaling_weak.jsonl")
    sys.exit(0)
