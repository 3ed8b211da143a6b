"""Mosaic feature probe for the coarse-tower megakernel (round 4).

The megakernel needs four in-kernel primitives beyond what the banded
smoother already uses; each is probed in ISOLATION with a tiny pallas
kernel compiled (and run) on the chip, so the megakernel design rests on
verified Mosaic capabilities rather than guesses:

  1. stride-2 sublane slice          x[::2, :]        (restriction rows)
  2. column-decimation dot           x @ D            (restriction cols, MXU)
  3. row interleave stack+reshape    stack([a,b],1).reshape(2R,C)  (prolong)
  4. full-array flatten reshape      x.reshape(R*C)   (dense coarse solve)

Each probe prints PASS/FAIL with the failure mode; FAILs are expected for
some — the megakernel uses the passing subset (matmul fallbacks exist for
1 and 3).
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 64, 256


def run_probe(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        got = jax.jit(f)(*args)
        return np.asarray(got)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, C)), jnp.float32)

    # 1. stride-2 sublane slice
    def k_stride(x_ref, o_ref):
        o_ref[:] = x_ref[:][::2, :]

    got = run_probe("stride2_rows", k_stride,
                    jax.ShapeDtypeStruct((R // 2, C), jnp.float32), x)
    if got is not None:
        ok = np.array_equal(got, np.asarray(x)[::2, :])
        print(f"{'PASS' if ok else 'FAIL(values)'} stride2_rows", flush=True)

    # 2. in-kernel dot with a decimation matrix
    D = jnp.asarray(np.eye(C, C // 2, dtype=np.float32))

    def k_dot(x_ref, d_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], d_ref[:],
                           preferred_element_type=jnp.float32)

    got = run_probe("dot_decimate", k_dot,
                    jax.ShapeDtypeStruct((R, C // 2), jnp.float32), x, D)
    if got is not None:
        ok = np.allclose(got, np.asarray(x) @ np.asarray(D), atol=1e-6)
        print(f"{'PASS' if ok else 'FAIL(values)'} dot_decimate", flush=True)

    # 3. row interleave via stack+reshape
    def k_interleave(x_ref, o_ref):
        a = x_ref[:]
        b = a + 1.0
        o_ref[:] = jnp.stack([a, b], axis=1).reshape(2 * R, C)

    got = run_probe("interleave_rows", k_interleave,
                    jax.ShapeDtypeStruct((2 * R, C), jnp.float32), x)
    if got is not None:
        want = np.stack([np.asarray(x), np.asarray(x) + 1.0], 1).reshape(2 * R, C)
        ok = np.array_equal(got, want)
        print(f"{'PASS' if ok else 'FAIL(values)'} interleave_rows", flush=True)

    # 4. flatten reshape (dense coarse solve's vec())
    def k_flatten(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(R * C, 1)

    got = run_probe("flatten", k_flatten,
                    jax.ShapeDtypeStruct((R * C, 1), jnp.float32), x)
    if got is not None:
        ok = np.array_equal(got[:, 0], np.asarray(x).reshape(-1))
        print(f"{'PASS' if ok else 'FAIL(values)'} flatten", flush=True)

    # 5. matmul row-decimation fallback (0/1 matrix on the left)
    Dr = np.zeros((R // 2, R), np.float32)
    Dr[np.arange(R // 2), 2 * np.arange(R // 2)] = 1.0
    Dr = jnp.asarray(Dr)

    def k_dot_rows(d_ref, x_ref, o_ref):
        o_ref[:] = jnp.dot(d_ref[:], x_ref[:],
                           preferred_element_type=jnp.float32)

    got = run_probe("dot_decimate_rows", k_dot_rows,
                    jax.ShapeDtypeStruct((R // 2, C), jnp.float32), Dr, x)
    if got is not None:
        ok = np.allclose(got, np.asarray(Dr) @ np.asarray(x), atol=1e-6)
        print(f"{'PASS' if ok else 'FAIL(values)'} dot_decimate_rows",
              flush=True)

    # 6. odd-rows average + interleave fallback via matmul:
    #    P (2R x R) bilinear row-prolongation matrix applied on the left
    P = np.zeros((2 * R, R), np.float32)
    P[2 * np.arange(R), np.arange(R)] = 1.0
    P[2 * np.arange(R - 1) + 1, np.arange(R - 1)] = 0.5
    P[2 * np.arange(R - 1) + 1, np.arange(R - 1) + 1] = 0.5
    P = jnp.asarray(P)

    def k_prolong_rows(p_ref, x_ref, o_ref):
        o_ref[:] = jnp.dot(p_ref[:], x_ref[:],
                           preferred_element_type=jnp.float32)

    got = run_probe("dot_prolong_rows", k_prolong_rows,
                    jax.ShapeDtypeStruct((2 * R, C), jnp.float32), P, x)
    if got is not None:
        ok = np.allclose(got, np.asarray(P) @ np.asarray(x), atol=1e-6)
        print(f"{'PASS' if ok else 'FAIL(values)'} dot_prolong_rows",
              flush=True)

    print("PROBE DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
