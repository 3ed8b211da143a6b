"""Isolated corr-kernel geometry stress: fused_rb_sweeps(corr=...) only."""
import sys, os; sys.path.insert(0, "/root/repo")
import argparse, time
ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=2048)
ap.add_argument("--budget-mb", type=float, required=True)
ap.add_argument("--limit-mb", type=float, required=True)
args = ap.parse_args()
import jax, jax.numpy as jnp, numpy as np
import hpcclassmultigridproject_tpu.ops.pallas.smoother as psm
psm._VMEM_BUDGET = int(args.budget_mb * 2**20)
psm._VMEM_LIMIT = int(args.limit_mb * 2**20)
from hpcclassmultigridproject_tpu.core.layout import pad_field
from hpcclassmultigridproject_tpu.core.problem import rotating_velocity
from hpcclassmultigridproject_tpu.mg.levels import build_fine_level
n = args.n
v1, v2 = rotating_velocity(n, dtype=jnp.float32)
level = build_fine_level(v1, v2, (1.0 / n) / 10, -4e-4, dtype=jnp.float32)
u = pad_field(jnp.zeros((n + 1, n + 1), jnp.float32).at[1:-1, 1:-1].set(1.0))
corr = 0.5 * u
rhs = jnp.zeros_like(u)
h = psm._halo(3)
bh = psm._pick_band(u.shape[0], u.shape[1], 4, h, n_in=5, n_out=2)
print("bh(corr)=", bh, flush=True)
f = jax.jit(lambda l, u, c, r: psm.fused_rb_sweeps(l, u, r, 3, want_residual=True, corr=c))
out, res = f(level, u, corr, rhs)
print("corr kernel ran:", float(np.asarray(out)[n//2, n//2]), flush=True)
# correctness vs add-then-smooth
g = jax.jit(lambda l, u, r: psm.fused_rb_sweeps(l, u, r, 3, want_residual=True))
out2, res2 = g(level, u + corr, rhs)
print("max diff vs add-then-smooth:", float(jnp.max(jnp.abs(out - out2))), flush=True)
