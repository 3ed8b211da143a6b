"""On-chip A/B of the coarse-tower megakernel (ops/pallas/tower.py).

Usage: python -u scripts/ab_tower_tpu.py <tower|plain> <TOWER_MAX_N>
           [floor] [incycle_max]
Runs the N=1024 flagship delta workload with the megakernel enabled/disabled
at a given cutoff, the banded-kernel auto floor, and the in-cycle jnp
crossover; one config per process.  Every run appends a row to
bench_data/tower_sweep.jsonl (the committed-data rule, VERDICT r4 weak #2).
Round-4 results in RESULTS.md (tower@512: 49.5-49.8 ms best).
"""

import sys, os
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
import json, time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
from hpcclassmultigridproject_tpu.models import AdvectionDiffusion
import hpcclassmultigridproject_tpu.mg.cycle as cyc
import hpcclassmultigridproject_tpu.ops.pallas.tower as twr

mode = sys.argv[1]          # "tower" | "plain"
max_n = int(sys.argv[2])    # TOWER_MAX_N
floor = int(sys.argv[3]) if len(sys.argv) > 3 else 0
incyc = int(sys.argv[4]) if len(sys.argv) > 4 else cyc._AUTO_JNP_MAX_INCYCLE_N
cyc._USE_TOWER = mode == "tower"
twr.TOWER_MAX_N = max_n
cyc._AUTO_PALLAS_MIN_N = floor
cyc._AUTO_JNP_MAX_INCYCLE_N = incyc
s = SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                 cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
                 delta_form=True)
m = AdvectionDiffusion(ProblemConfig(n=1024), s)
uT, st = m.run(warn=False)
np.asarray(jnp.ravel(uT)[-2])
times = []
for _ in range(7):
    t0 = time.perf_counter()
    uT, st = m.run(warn=False)
    np.asarray(jnp.ravel(uT)[-2])
    times.append(time.perf_counter() - t0)
ts = sorted(times)
row = {
    "mode": mode, "tower_max_n": max_n, "floor": floor,
    "incycle_jnp_max_n": incyc,
    "best_s": round(ts[0], 4), "median_s": round(ts[len(ts) // 2], 4),
    "times_s": [round(t, 4) for t in times],
    "center_uT": float(uT[512, 512]),
    "final_rel_residual_f64": float(np.asarray(st["final_rel_residual_hi"])),
    "device": str(jax.devices()[0]),
    "timestamp": __import__("datetime").datetime.now().isoformat(timespec="seconds"),
}
with open(os.path.join(_ROOT, "bench_data", "tower_sweep.jsonl"), "a") as f:
    f.write(json.dumps(row) + "\n")
print(json.dumps(row), flush=True)
