"""On-chip smoke test for the Pallas hot path (VERDICT r2 item #3).

Run this BEFORE committing any change that touches ops/pallas/ (and cite the
run in the commit message).  Round 2 ended by shipping a VMEM retune that was
never run on hardware; the next hardware contact — the driver's bench — hit a
TPU kernel fault (BENCH_r02.json rc=1).  This script is the ~2-minute guard
that makes that impossible to repeat:

  1. fused red–black smoother (+ trailing residual) at n ∈ {64, 1024, 4096},
     checked against the jnp padded path on the same chip,
  2. one delta-form timestep block (fused accumulate+open kernel),
  3. one full flagship-config solve at n=256 checked against the
     measured reference oracle (uT center 4.802e-5, SURVEY §0).

Exits non-zero on any failure.  Writes progress lines unbuffered (the axon
tunnel serializes clients; a timed-out run must still show where it died).

Usage:  python -u scripts/smoke_tpu.py [--sizes 64,1024,4096]
"""

import argparse
import os
import sys
import time

# Hermetic from any cwd without PYTHONPATH (which breaks axon plugin
# discovery): put the repo root on sys.path from this file's location.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax

jax.config.update("jax_enable_x64", True)  # flagship uses refine_dtype=f64

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


def log(msg):
    print(msg, flush=True)


def check_smoother(n):
    t0 = time.perf_counter()
    rng = np.random.default_rng(n)
    shape = (n + 1, n + 1)
    v1, v2 = rotating_velocity(n)
    level = build_fine_level(v1, v2, (1.0 / n) / 10, -4e-4, dtype=jnp.float32)
    u = rng.standard_normal(shape).astype(np.float32)
    u[0, :] = u[-1, :] = u[:, 0] = u[:, -1] = 0.0
    rhs = rng.standard_normal(shape).astype(np.float32)
    rhs[0, :] = rhs[-1, :] = rhs[:, 0] = rhs[:, -1] = 0.0
    u = pad_field(jnp.asarray(u))
    rhs = pad_field(jnp.asarray(rhs))

    got_u, got_r = jax.jit(
        lambda l, a, b: fused_rb_sweeps(l, a, b, NSWEEPS, want_residual=True)
    )(level, u, rhs)
    _sync(got_u)

    @jax.jit
    def ref(l, a, b):
        for _ in range(NSWEEPS):
            a = pops.rb_gauss_seidel(l, a, b)
        return a, pops.residual(l, a, b)

    want_u, want_r = ref(level, u, rhs)
    gu, wu = np.asarray(got_u), np.asarray(want_u)
    gr, wr = np.asarray(got_r), np.asarray(want_r)
    assert np.all(np.isfinite(gu)) and np.all(np.isfinite(gr)), f"n={n}: NaN/inf"
    du = np.abs(gu - wu).max() / max(np.abs(wu).max(), 1e-30)
    dr = np.abs(gr - wr).max() / max(np.abs(wu).max(), 1e-30)
    # f32 association drift between the two programs; anything beyond a few
    # hundred ulps of the field scale means a stale halo / masking bug
    assert du < 1e-4, f"n={n}: fused u drift {du:.2e}"
    assert dr < 1e-4, f"n={n}: fused residual drift {dr:.2e}"
    log(f"PASS smoother n={n}  (rel drift u {du:.1e}, res {dr:.1e}, "
        f"{time.perf_counter() - t0:.1f}s)")


def check_flagship(n=256, steps=100):
    from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
    from hpcclassmultigridproject_tpu.models import AdvectionDiffusion

    t0 = time.perf_counter()
    model = AdvectionDiffusion(
        ProblemConfig(n=n, num_steps=steps),
        SolverConfig(
            dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
            cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
            delta_form=True,
        ),
    )
    uT, stats = model.run(warn=False)
    _sync(uT)
    center = float(uT[n // 2, n // 2])
    oracle = 4.802e-5  # measured reference uT[128][128] at N=256 (SURVEY §0)
    assert abs(center - oracle) < 2e-8, f"center {center:.6e} vs {oracle:.3e}"
    max_rel = float(np.asarray(stats["rel_residual"]).max())
    assert max_rel <= 1e-6, f"rel residual {max_rel:.2e} > 1e-6"
    fin = float(np.asarray(stats["final_rel_residual_hi"]))
    assert fin <= 1e-6, f"final f64 residual {fin:.2e} > 1e-6"
    log(f"PASS flagship n={n} ({steps} steps: center {center:.4e}, "
        f"max rel res {max_rel:.1e}, f64 final {fin:.1e}, "
        f"{time.perf_counter() - t0:.1f}s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="64,1024,4096")
    args = ap.parse_args()
    log(f"device: {jax.devices()[0]}")
    for n in [int(s) for s in args.sizes.split(",") if s]:
        check_smoother(n)
    check_flagship()
    log("SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
