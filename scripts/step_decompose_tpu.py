"""Slope-method decomposition: (t(L2)-t(L1))/(L2-L1) cancels tunnel.
Appends every measured piece to bench_data/decompose.jsonl (committed-data
rule, VERDICT r4 weak #2)."""
import datetime, json, os, sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np

from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
from hpcclassmultigridproject_tpu.models import AdvectionDiffusion
from hpcclassmultigridproject_tpu.mg import cycle as cyc
from hpcclassmultigridproject_tpu.ops.pallas.delta_step import fused_accumulate_open
from hpcclassmultigridproject_tpu.ops.pallas.smoother import fused_rb_sweeps
from hpcclassmultigridproject_tpu.ops.padded import (
    interior_norm, prolong_bilinear, restrict_inject)

N = 1024
m = AdvectionDiffusion(
    ProblemConfig(n=N, num_steps=100),
    SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                 cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
                 delta_form=True))
levels = m.levels; fine = levels[0]; cfg = m.solver
u0 = m.u0.astype(jnp.float32); rhs0 = jnp.zeros_like(u0)
lo0 = jnp.zeros_like(u0)

def scanner(body, L):
    @jax.jit
    def run(u):
        out, _ = jax.lax.scan(lambda c, _: (body(c), None), u, None, length=L)
        return out
    return run

def t(run, arg, reps=5):
    out = run(arg); np.asarray(out.ravel()[-2])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = run(arg); np.asarray(out.ravel()[-2])
        ts.append(time.perf_counter() - t0)
    return min(ts)

_STAMP = datetime.datetime.now().isoformat(timespec="seconds")


def slope(name, body, L1=20, L2=100):
    r1, r2 = scanner(body, L1), scanner(body, L2)
    us = (t(r2, u0) - t(r1, u0)) / (L2 - L1) * 1e6
    print(f"{name}: {us:.1f} us/iter", flush=True)
    row = {"piece": name, "us_per_iter": round(us, 1), "n": N,
           "device": str(jax.devices()[0]), "timestamp": _STAMP}
    with open("/root/repo/bench_data/decompose.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")

slope("smooth_block(res)", lambda c: fused_rb_sweeps(fine, c, rhs0, 3, want_residual=True)[0])
slope("smooth_block(no_res)", lambda c: fused_rb_sweeps(fine, c, rhs0, 3)[0])
slope("open_kernel", lambda c: fused_accumulate_open(fine, c, lo0, 0.001*c)[0])
def top(c):
    u, r = fused_rb_sweeps(fine, c, rhs0, 3, want_residual=True)
    rc = restrict_inject(r, levels[1].padded)
    u, _ = fused_rb_sweeps(fine, u, rhs0, 3, corr=prolong_bilinear(rc, fine.padded))
    return u
slope("top_level(blocks+restrict+prolongcorr)", top)
def vc(c):
    u, r = cyc.mg_cycle(levels, c, rhs0, cfg, want_final_residual=True)
    return u + 1e-30 * r
slope("v_cycle_full", vc)
def vcn(c):
    u, r = cyc.mg_cycle(levels, c, rhs0, cfg, want_final_residual=True)
    return u * (1.0 + 1e-30 * (interior_norm(r) + interior_norm(u)))
slope("v_cycle+2norms", vcn)
