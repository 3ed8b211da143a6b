import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
from hpcclassmultigridproject_tpu.models import AdvectionDiffusion
from hpcclassmultigridproject_tpu.ops import padded as pops
from hpcclassmultigridproject_tpu.mg.cycle import mg_cycle
from hpcclassmultigridproject_tpu.mg.timestepper import timestep

def timeit(name, build_fn, reps=20):
    f = jax.jit(build_fn)
    np.asarray(jax.tree.leaves(f())[0])
    t0 = time.perf_counter(); _ = np.asarray(jnp.ravel(jax.tree.leaves(f())[0])[0])
    dt = (time.perf_counter()-t0)/reps*1e3
    print(f"{name}: {dt:.3f} ms", flush=True)

cfg = SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                   cycle_mode="fixed", num_cycles=2, coarse_mode="dense")
m = AdvectionDiffusion(ProblemConfig(n=1024), cfg)
lv = m.levels; hi = m.fine_hi
u32 = m.u0.astype(jnp.float32); rhs32 = pops.compute_rhs(lv[0], u32)
u64 = m.u0; rhs64 = pops.compute_rhs(hi, u64)

def scan20(body, init):
    return lambda: jax.lax.scan(lambda c, _: (body(c), None), init, None, length=20)[0]

timeit("smooth3_f32_fine", scan20(lambda u: pops.rb_gauss_seidel(lv[0], pops.rb_gauss_seidel(lv[0], pops.rb_gauss_seidel(lv[0], u, rhs32), rhs32), rhs32), u32))
timeit("residual_f32_fine", scan20(lambda u: u + 1e-30*pops.residual(lv[0], u, rhs32), u32))
timeit("residual_f64_fine", scan20(lambda u: u + 1e-30*pops.residual(hi, u, rhs64), u64))
timeit("rhs_f64", scan20(lambda u: 1e-30*pops.compute_rhs(hi, u) + u, u64))
timeit("vcycle_f32_full", scan20(lambda u: mg_cycle(lv, u, rhs32, cfg), u32))
timeit("timestep_mixed_2cyc", scan20(lambda u: timestep(lv, u, cfg, fine_hi=hi)[0], u64))
cfg1 = SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                    cycle_mode="fixed", num_cycles=1, coarse_mode="dense")
timeit("timestep_mixed_1cyc", scan20(lambda u: timestep(lv, u, cfg1, fine_hi=hi)[0], u64))

# full run certificate with 1 cycle
m1 = AdvectionDiffusion(ProblemConfig(n=1024), cfg1)
uT, stats = m1.run(); np.asarray(jnp.ravel(uT)[0])
t0 = time.perf_counter(); uT, stats = m1.run(); _ = np.asarray(jnp.ravel(uT)[0]); dt = time.perf_counter()-t0
print(f"full_run_1cyc: {dt:.3f} s  max_rel={float(np.asarray(stats['rel_residual']).max()):.3e} center={float(uT[512,512]):.6e}", flush=True)
