import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rows, cols = 1032, 1152
bh, h = 88, 8
grid = pl.cdiv(rows, bh)
x = jnp.ones((rows, cols), jnp.float32)

def timeit(f, *a, reps=20):
    g = jax.jit(lambda *a: jax.lax.scan(lambda c, _: (f(*a[:-1], c), None), a[-1], None, length=reps)[0])
    np.asarray(g(*a))
    t0 = time.perf_counter(); _ = np.asarray(jnp.ravel(g(*a))[0]); return (time.perf_counter()-t0)/reps*1e3

in_spec_elem = pl.BlockSpec(
    (pl.Element(bh + 2*h, (0, bh + 2*h)), pl.Element(cols, (0, 0))),
    lambda i: (pl.multiple_of(jnp.maximum(i*bh - h, 0), 8), 0),
    memory_space=pltpu.VMEM)
in_spec_blk = pl.BlockSpec((bh, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
out_spec = pl.BlockSpec((bh, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
oshape = jax.ShapeDtypeStruct((rows, cols), jnp.float32)

def copy_blk(u):
    def k(u_ref, o_ref):
        o_ref[:] = u_ref[:] * 2.0
    return pl.pallas_call(k, grid=(grid,), in_specs=[in_spec_blk], out_specs=out_spec, out_shape=oshape)(u)

def copy_elem(u):
    def k(u_ref, o_ref):
        o_ref[:] = u_ref[h:h+bh, :] * 2.0
    return pl.pallas_call(k, grid=(grid,), in_specs=[in_spec_elem], out_specs=out_spec, out_shape=oshape)(u)

def sixpass_elem(u):
    def k(u_ref, o_ref):
        v = u_ref[:]
        for p in range(6):
            up = jnp.pad(v[:-1, :], ((1, 0), (0, 0)))
            v = v * 1.01 + up * 0.01
        o_ref[:] = v[h:h+bh, :]
    return pl.pallas_call(k, grid=(grid,), in_specs=[in_spec_elem], out_specs=out_spec, out_shape=oshape)(u)

def six_windows(u):
    # 6 element-window inputs like the real smoother
    def k(*refs):
        acc = 0.0
        for r in refs[:6]:
            acc = acc + r[:]
        refs[6][:] = acc[h:h+bh, :]
    return pl.pallas_call(k, grid=(grid,), in_specs=[in_spec_elem]*6, out_specs=out_spec, out_shape=oshape)(u, u, u, u, u, u)

print("copy_blk    :", timeit(copy_blk, x), "ms", flush=True)
print("copy_blk2   :", timeit(copy_blk, x), "ms", flush=True)
print("copy_elem   :", timeit(copy_elem, x), "ms", flush=True)
print("sixpass_elem:", timeit(sixpass_elem, x), "ms", flush=True)
print("six_windows :", timeit(six_windows, x), "ms", flush=True)
