"""Single-configuration on-chip probe for the fused-smoother band height
(VERDICT r2 item #7: the n=4096 band-efficiency cliff).

Runs ONE (n, vmem_budget, vmem_limit) configuration per invocation — so a
Mosaic fault in one config cannot take the whole sweep down — measuring the
3-sweep+residual from_v smoother block exactly as scripts/bench_smoother_tpu
does (two-loop-count difference method) and verifying against the jnp path.

A raised limit emits an explicit vmem_limit_bytes via the module's opt-in
override; _assert_vmem_fit screens configurations whose modeled working set
exceeds the limit at trace time (those report status="rejected" instead of
faulting the chip).  THE DEFAULTS IN ops/pallas/smoother.py ONLY CHANGE
after a probed configuration ALSO passes scripts/smoke_tpu.py on hardware.

Usage:
  python -u scripts/band_probe_tpu.py --n 4096 --budget-mb 8 --limit-mb 32 \
      --out bench_data/band_probe.jsonl
"""

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax
import jax.numpy as jnp
import numpy as np

import hpcclassmultigridproject_tpu.ops.pallas.smoother as psm
from hpcclassmultigridproject_tpu.core.layout import pad_field
from hpcclassmultigridproject_tpu.core.problem import rotating_velocity
from hpcclassmultigridproject_tpu.mg.levels import build_fine_level
from hpcclassmultigridproject_tpu.ops import padded as pops

NSWEEPS = 3


def _sync(x):
    np.asarray(jnp.ravel(x)[-2])


def make_runner(block, loops):
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
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--budget-mb", type=float, required=True)
    ap.add_argument("--limit-mb", type=float, default=16.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="bench_data/band_probe.jsonl")
    ap.add_argument("--slim", action="store_true",
                    help="build a velocities-only level (the from_v kernel "
                         "reads only v1/v2; saves 4 coefficient arrays of "
                         "HBM — required at n=16384 where the full level + "
                         "jnp crosscheck RESOURCE_EXHAUSTs the 16 GB chip)")
    ap.add_argument("--no-check", action="store_true",
                    help="skip the jnp crosscheck (its temporaries OOM at "
                         "n=16384; kernel equivalence is pinned at smaller "
                         "sizes and by tests)")
    ap.add_argument("--check-slab", type=int, default=0,
                    help="crosscheck S mid-grid rows against a jnp reference "
                         "computed on a (S + 2*8)-row sub-slab — the "
                         "full-size jnp reference RESOURCE_EXHAUSTs at "
                         "n=16384, but the kernel's 6-pass cascade has a "
                         "7-row dependency radius, so an 8-row-margin slab "
                         "reproduces the interior rows exactly (the band-"
                         "validity argument; VERDICT r4 weak #4)")
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode pallas on CPU (local validation of "
                         "the probe's own logic, e.g. the slab crosscheck)")
    ap.add_argument("--device-build", action="store_true",
                    help="build the level on device from iota (mg/levels.py"
                         "::build_fine_level_device) — no host transfer; at "
                         "n=16384 the host build ships ~2.1 GB over the "
                         "~5 MB/s tunnel")
    args = ap.parse_args()

    if args.interpret:
        psm.INTERPRET = True
    psm._VMEM_BUDGET = int(args.budget_mb * 2**20)
    psm._VMEM_LIMIT = int(args.limit_mb * 2**20)

    n = args.n
    if args.device_build:
        from hpcclassmultigridproject_tpu.mg.levels import (
            build_fine_level_device,
        )

        level = build_fine_level_device(
            n, np.pi, np.pi, (1.0 / n) / 10, -4e-4, dtype=jnp.float32,
            store_coefficients=not args.slim,
        )
    else:
        v1, v2 = rotating_velocity(n, dtype=jnp.float32)
        level = build_fine_level(v1, v2, (1.0 / n) / 10, -4e-4,
                                 dtype=jnp.float32,
                                 store_coefficients=not args.slim)
    u = pad_field(jnp.zeros((n + 1, n + 1), jnp.float32).at[1:-1, 1:-1].set(1.0))
    rhs = jnp.zeros_like(u)
    rows, cols = u.shape
    h = psm._halo(NSWEEPS)
    # mirror the kernel's own geometry choice (from_v + residual: 4 in /
    # 2 out) INCLUDING the calibrated-footprint cap — probing an uncapped
    # bh would reject configs the kernel itself runs fine (round-4 fix)
    bh = psm._pick_band(rows, cols, 4, h, n_in=4, n_out=2)
    rec = {"n": n, "budget_mb": args.budget_mb, "limit_mb": args.limit_mb,
           "bh": bh, "halo_overhead": round((bh + 2 * h) / bh, 3),
           "device": str(jax.devices()[0])}

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    sink = open(args.out, "a")

    def emit(status, **kw):
        rec.update(status=status, **kw)
        sink.write(json.dumps(rec) + "\n")
        sink.flush()
        print(json.dumps(rec), flush=True)

    # trace-time screen: modeled working set vs the chosen cap
    try:
        psm._assert_vmem_fit(bh, cols, 4, h, n_in=4, n_out=2)
    except ValueError as e:
        emit("rejected", reason=str(e))
        return 0

    def block(level, u, rhs):
        return psm.fused_rb_sweeps(level, u, rhs, NSWEEPS, want_residual=True)

    def jnp_block(level, u, rhs):
        for _ in range(NSWEEPS):
            u = pops.rb_gauss_seidel(level, u, rhs)
        return u, pops.residual(level, u, rhs)

    err = None
    slab_rows = None
    if args.check_slab:
        # kernel on the FULL array; jnp reference on a mid-grid sub-slab
        # with identical operands (the device level's own v1/v2 rows) — the
        # artificial slab edges corrupt at most 1 row per color pass, so
        # with an 8-row margin (> the 7-row cascade radius) the compared
        # center rows are exactly what the full-size jnp run would produce.
        # An EVEN slab start keeps the local (i+j) color parity global.
        m0 = 8
        S = args.check_slab
        r0 = (rows // 2) // 2 * 2
        lo = r0 - m0
        sl = lambda a: jax.lax.slice_in_dim(a, lo, r0 + S + m0, axis=0)
        v1s = np.asarray(sl(level.v1))
        v2s = np.asarray(sl(level.v2))
        # precomputed-coefficient slab level: the GLOBAL interior mask
        # travels in the coefficient data (zero outside rows 1..n-1), so
        # the local-index jnp path needs no row offset
        rr_c = 0.5 * level.dt / (level.h * level.h)
        half_h = 0.5 * level.h
        gmask = (
            ((np.arange(lo, r0 + S + m0)[:, None] >= 1)
             & (np.arange(lo, r0 + S + m0)[:, None] <= n - 1))
            & ((np.arange(cols)[None, :] >= 1)
               & (np.arange(cols)[None, :] <= n - 1))
        ).astype(np.float32)
        from hpcclassmultigridproject_tpu.mg.levels import Level as _Lvl

        slab_level = _Lvl(
            aa=jnp.asarray(rr_c * (-v2s * half_h + level.nu) * gmask),
            bb=jnp.asarray(rr_c * (v2s * half_h + level.nu) * gmask),
            cc=jnp.asarray(rr_c * (-v1s * half_h + level.nu) * gmask),
            dd=jnp.asarray(rr_c * (v1s * half_h + level.nu) * gmask),
            v1=jnp.asarray(v1s), v2=jnp.asarray(v2s), a_inv=None,
            n=n, h=level.h, dt=level.dt, nu=level.nu,
            diag_a=level.diag_a, diag_b=level.diag_b,
        )
        up, _ = jax.jit(block)(level, u, rhs)
        uj_s, _ = jax.jit(jnp_block)(
            slab_level, sl(u), sl(rhs)
        )
        got = np.asarray(jax.lax.slice_in_dim(up, r0, r0 + S, axis=0))
        want = np.asarray(uj_s)[m0:m0 + S]
        err = float(np.max(np.abs(got - want)))
        slab_rows = [r0, r0 + S]
        del up, uj_s
    elif not args.no_check:
        up, _ = jax.jit(block)(level, u, rhs)
        uj, _ = jax.jit(jnp_block)(level, u, rhs)
        err = float(jnp.max(jnp.abs(uj - up)))

    l1 = max(4, (1024 // max(n // 4, 1)) ** 2 * 4)
    l1 = max(4, min(l1, 64))
    l2 = 5 * l1
    t1 = timed(make_runner(block, l1), level, u, rhs, args.reps)
    t2 = timed(make_runner(block, l2), level, u, rhs, args.reps)
    per_block = (t2 - t1) / (l2 - l1)
    points = (n - 1) ** 2
    emit("ok",
         us_per_block=round(per_block * 1e6, 1),
         stencil_gdof_s=round(points * NSWEEPS / per_block / 1e9, 2),
         max_abs_diff_vs_jnp=err,
         check_slab_rows=slab_rows,
         device_build=bool(args.device_build))
    return 0


if __name__ == "__main__":
    sys.exit(main())
