import sys, os; sys.path.insert(0, "/root/repo")
import argparse
ap = argparse.ArgumentParser()
ap.add_argument("--budget-mb", type=float, default=12)
ap.add_argument("--limit-mb", type=float, default=48)
ap.add_argument("--n", type=int, default=2048)
ap.add_argument("--no-corr", action="store_true")
ap.add_argument("--no-open", action="store_true")
args = ap.parse_args()
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
import hpcclassmultigridproject_tpu.ops.pallas.smoother as psm
if args.budget_mb != 12:
    # an explicit --budget-mb means "probe THIS budget": disable the
    # narrow-row clamps (_budget_for/_limit_for would silently cap n<=2048
    # rows to 4/16 MB, neutering the knob at this script's own default
    # n=2048 — ADVICE r3 #2) by classifying every row as wide
    psm._VMEM_BUDGET = int(args.budget_mb * 2**20)
    psm._WIDE_ROW_BYTES = 0
if args.limit_mb != 48: psm._VMEM_LIMIT = int(args.limit_mb * 2**20)
# a clamped/capped probe must be visible: report the effective band height
from hpcclassmultigridproject_tpu.core.layout import padded_shape
_r, _c = padded_shape(args.n)
print("effective bh (from_v corr kernel): %d" % psm._pick_band(
    _r, _c, 4, psm._halo(3), n_in=5, n_out=2), flush=True)
from hpcclassmultigridproject_tpu.mg import cycle as cyc
from hpcclassmultigridproject_tpu.mg import delta as dmod
if args.no_corr: cyc._FUSE_CORR = False
if args.no_open: dmod._FUSE_OPEN = False
from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
from hpcclassmultigridproject_tpu.models import AdvectionDiffusion
m = AdvectionDiffusion(
    ProblemConfig(n=args.n, num_steps=2),
    SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                 cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
                 delta_form=True))
uT, stats = m.run(warn=False)
print("OK corr=%s open=%s center" % (not args.no_corr, not args.no_open),
      float(np.asarray(uT)[args.n//2, args.n//2]), flush=True)
