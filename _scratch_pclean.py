import time, numpy as np, jax, jax.numpy as jnp
out = open("/tmp/pclean.txt", "w", buffering=1)
import hpcclassmultigridproject_tpu.ops.pallas.smoother as psm
from hpcclassmultigridproject_tpu.core.layout import pad_field
from hpcclassmultigridproject_tpu.mg.levels import build_fine_level
from hpcclassmultigridproject_tpu.ops import padded as pops

n = 1024
rng = np.random.default_rng(0)
shape = (n+1, n+1)
t0=time.perf_counter()
level = build_fine_level(jnp.asarray(rng.standard_normal(shape), jnp.float32),
                         jnp.asarray(rng.standard_normal(shape), jnp.float32),
                         (1.0/n)/10, -4e-4, dtype=jnp.float32)
u0 = rng.standard_normal(shape); u0[0,:]=u0[-1,:]=u0[:,0]=u0[:,-1]=0
r0 = rng.standard_normal(shape); r0[0,:]=r0[-1,:]=r0[:,0]=r0[:,-1]=0
u = pad_field(jnp.asarray(u0, jnp.float32)); rhs = pad_field(jnp.asarray(r0, jnp.float32))
np.asarray(u); np.asarray(level.aa)
print("construct:", time.perf_counter()-t0, file=out)

@jax.jit
def many_jnp(u, rhs):
    def body(u, _):
        for _ in range(3):
            u = pops.rb_gauss_seidel(level, u, rhs)
        return u, None
    return jax.lax.scan(body, u, None, length=50)[0]

@jax.jit
def many_fused(u, rhs):
    def body(u, _):
        v, _r = psm.fused_rb_sweeps(level, u, rhs, 3, want_residual=False)
        return v, None
    return jax.lax.scan(body, u, None, length=50)[0]

for name, f in (("jnp", many_jnp), ("fused", many_fused)):
    t0=time.perf_counter(); np.asarray(f(u, rhs)); print(f"{name} compile+first: {time.perf_counter()-t0:.1f}s", file=out)
    t0=time.perf_counter(); _=np.asarray(jnp.ravel(f(u,rhs))[0]); dt=(time.perf_counter()-t0)/50*1e3
    print(f"{name}: {dt:.3f} ms per 3-sweep smooth", file=out)
out.close()
