"""On-chip A/B of the coarse-tower megakernel (ops/pallas/tower.py).

Usage: python -u scripts/ab_tower_tpu.py <tower|plain> <TOWER_MAX_N> [floor]
Runs the N=1024 flagship delta workload with the megakernel enabled/disabled
at a given cutoff and the banded-kernel auto floor; one config per process.
Round-4 results in RESULTS.md (tower@512: 49.5-49.8 ms best).
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
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
cyc._USE_TOWER = mode == "tower"
twr.TOWER_MAX_N = max_n
cyc._AUTO_PALLAS_MIN_N = floor
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
print("mode=%s max_n=%d floor=%d best %.4f med %.4f center %.9e cert %.2e" % (
    mode, max_n, floor, ts[0], ts[len(ts)//2],
    float(uT[512,512]), float(np.asarray(st["final_rel_residual_hi"]))), flush=True)
