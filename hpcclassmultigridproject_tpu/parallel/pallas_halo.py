"""Sharded Pallas smoothing: the fused red–black kernel under shard_map with
deep-halo exchange (VERDICT r2 item #4 — the multi-chip perf story).

Round 2 left multi-chip fine levels on the jnp smoother (GSPMD inserts a
one-cell halo exchange per COLOR PASS — 2·nsweeps sequential, latency-bound
ICI rounds per smooth block, and the 6-pass jnp form costs ~6x the fused
kernel's HBM traffic).  This module runs the fused Pallas kernel
(ops/pallas/smoother.py) on each device's local block instead:

  * Levels are partitioned by ROWS over ALL mesh devices
    (PartitionSpec((ax_x, ax_y), None)) rather than 2-D blocks: local blocks
    keep the full 128-lane-aligned width (the TPU-friendly layout), the halo
    exchange needs no corner handling, and the Pallas kernel runs unmodified
    on the local block.
  * ONE ppermute round exchanges an H-row deep halo (H = the kernel's
    dependency radius, ops/pallas/smoother.py::_halo) for every operand, then
    the WHOLE smooth block — all 2·nsweeps color passes plus the trailing
    residual — runs locally in VMEM.  This is temporal blocking across the
    device boundary, exactly the kernel's own band mechanism lifted to the
    mesh: 2·nsweeps+1 sequential one-row exchange rounds collapse into one
    batched round whose 12 ppermutes all fly concurrently (and overlap with
    the zero-pad/concat prologue), amortizing ICI latency the way
    gs.cu:344-366 amortizes global-memory latency into one shared-mem tile
    load.

Correctness of the center-extraction (same argument as the kernel's
first/last band exemption, smoother.py:20-25): each device smooths its
extended block [local − H … local + H] as if the extended edges were true
array edges (zero-fill).  The error this introduces at the extended edges
propagates inward one row per color pass, so after 2·nsweeps passes plus the
residual it has reached at most row 2·nsweeps < H; the center rows sliced
out are untouched, and the exchanged halo rows they DO depend on carry true
pre-sweep values.  Device 0 / device n−1 receive ppermute zero-fill, which
matches the padded layout's zero margins at true grid edges
(core/layout.py) — no edge special-casing.

Row divisibility: shard_map needs rows % ndev == 0 and color parity needs an
EVEN per-device block height (odd local heights would flip the global (i+j)
parity on odd-ranked devices).  Fields are therefore zero-row-padded up to a
multiple of lcm(2·ndev, 8) — at most 2·ndev−1 extra rows of zeros, harmless
under the padded-layout invariant — and the result is sliced back.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hpcclassmultigridproject_tpu.ops.pallas.smoother import (
    _fused,
    _halo,
    cn_params,
)


def rows_spec(mesh: Mesh) -> P:
    """Rows-only partition spec over ALL of `mesh`'s axes (flattened)."""
    return P(tuple(mesh.axis_names), None)


def is_rows_sharding(sharding) -> bool:
    """True iff `sharding` partitions rows (axis 0) and replicates columns."""
    spec = getattr(sharding, "spec", None)
    if spec is None or len(spec) == 0 or spec[0] is None:
        return False
    return all(s is None for s in spec[1:])


def _row_multiple(ndev: int) -> int:
    return math.lcm(2 * ndev, 8)


def padded_rows_for(rows: int, ndev: int) -> int:
    m = _row_multiple(ndev)
    return -(-rows // m) * m


def fused_smooth_sharded(
    mesh: Mesh,
    level,
    u,
    rhs,
    nsweeps: int,
    want_residual: bool = False,
    zero_init: bool = False,
    overlap: bool = False,
):
    """`nsweeps` fused red–black sweeps (+ optional trailing residual) on a
    rows-sharded field: ONE deep-halo ppermute round, then the fused Pallas
    kernel per local block.

    Drop-in replacement for the smooth(+residual) block on rows-sharded
    5-point levels (wired in mg/cycle.py::_smooth_block); tests/test_halo.py
    asserts agreement with the single-device fused kernel on the 8-device CPU
    mesh (interpret mode), within the kernel's cross-geometry ulp contract.

    `zero_init=True` (correction solves): the iterate is known-zero, so the
    u operand AND its halo exchange are dropped entirely.

    `overlap=True` (VERDICT r3 weak #3 / SURVEY §7.6): take the exchange
    round off the critical path.  The plain schedule serializes
    exchange → kernel; the overlapped one launches the kernel on the RAW
    local block first — its center rows [h, local−h) need no halo, so the
    launch has no data dependency on the ppermutes and XLA schedules it
    between collective-permute-start and -done — then patches the two
    h-row edge bands with small kernel invocations on 3h-row slabs built
    from the received halos.  Validity is the kernel's own band argument
    applied per invocation: artificial-edge corruption propagates one row
    per color pass, so after 2·nsweeps+1 ≤ h passes the extracted center
    rows ([h, local−h) of the interior run, slab rows [h, 2h) of each edge
    run) are schedule-exact.  Costs two extra kernel launches and ~4h rows
    of redundant compute per block; wins when the ICI round's latency
    exceeds that — the large-slab regime (see the ICI model, RESULTS.md
    round 4).  Values agree with overlap=False to the kernel's
    cross-geometry ulp contract (bit-exact in interpret mode,
    tests/test_halo.py).
    """
    if level.diag is not None or level.ne is not None:
        raise NotImplementedError(
            "fused sharded smoothing supports 5-point scalar-diagonal levels "
            "only (Galerkin levels run under the GSPMD jnp path)"
        )
    axes = tuple(mesh.axis_names)
    ndev = math.prod(mesh.shape[a] for a in axes)
    h = _halo(nsweeps)
    rows, cols = rhs.shape
    rows_p = padded_rows_for(rows, ndev)
    local = rows_p // ndev
    if local < 2 * h:
        raise ValueError(
            f"per-device block of {local} rows is thinner than the halo "
            f"cascade depth 2*{h}; use fewer devices or the GSPMD path"
        )
    pad = lambda a: jnp.pad(a, ((0, rows_p - rows), (0, 0)))
    if getattr(level, "cn_from_v", False):
        # from_v kernel: exchange (u, rhs, v1, v2) halos instead of
        # (u, rhs, aa, bb, cc, dd) — 1/3 less ICI per block and the
        # measured 25-30% HBM saving of the recomputed-coefficient form.
        # The kernel's interior mask needs GLOBAL row indices, supplied per
        # device via the row_off SMEM scalar (smoother.py::with_row_off).
        # cn_params is the shared jit-cache-keyed tuple (ADVICE r3 #4).
        cn = cn_params(level)
        fields = (level.v1, level.v2)
    else:
        cn = None
        fields = (level.aa, level.bb, level.cc, level.dd)
    args = (rhs, *fields) if zero_init else (u, rhs, *fields)
    args = tuple(pad(a) for a in args)

    fwd = [(i, i + 1) for i in range(ndev - 1)]
    bwd = [(i + 1, i) for i in range(ndev - 1)]
    spec = P(axes, None)
    n_out = 2 if want_residual else 1
    kern = functools.partial(
        _fused,
        nsweeps=nsweeps,
        diag_a=level.diag_a,
        want_residual=want_residual,
        cn=cn,
        zero_init=zero_init,
        with_row_off=cn is not None,
    )

    def run_plain(*blocks):
        # one batched deep-halo round: every ppermute below is independent,
        # so XLA schedules all of them concurrently
        ext = []
        for b in blocks:
            top = jax.lax.ppermute(b[-h:, :], axes, fwd)  # prev block's tail
            bot = jax.lax.ppermute(b[:h, :], axes, bwd)   # next block's head
            ext.append(jnp.concatenate([top, b, bot], axis=0))
        if cn is not None:
            # extended-block row 0 is global row (dev*local - h)
            dev = jax.lax.axis_index(axes)
            ext.append(
                (dev.astype(jnp.int32) * jnp.int32(local) - jnp.int32(h)
                 ).reshape(1, 1)
            )
        out = kern(*ext)
        if want_residual:
            u_e, r_e = out
            return u_e[h : h + local, :], r_e[h : h + local, :]
        return out[h : h + local, :]

    def run_overlap(*blocks):
        # 1) issue the deep-halo exchanges first
        tops = [jax.lax.ppermute(b[-h:, :], axes, fwd) for b in blocks]
        bots = [jax.lax.ppermute(b[:h, :], axes, bwd) for b in blocks]
        base = jax.lax.axis_index(axes).astype(jnp.int32) * jnp.int32(local)
        off = lambda v: v.reshape(1, 1)
        # 2) interior kernel on the RAW local block — no data dependency on
        #    the ppermutes, so it schedules between permute-start and -done;
        #    its center rows [h, local-h) are halo-independent and valid
        int_args = list(blocks) + ([off(base)] if cn is not None else [])
        out_i = kern(*int_args)
        # 3) patch the two h-row edge bands: 3h-row slabs of (received halo
        #    + 2h local rows); slab rows [h, 2h) are beyond both the real
        #    halo's reach and the artificial far edge's corruption depth
        top_args = [
            jnp.concatenate([t, b[: 2 * h, :]], axis=0)
            for t, b in zip(tops, blocks)
        ]
        bot_args = [
            jnp.concatenate([b[-2 * h :, :], bo], axis=0)
            for b, bo in zip(blocks, bots)
        ]
        if cn is not None:
            top_args.append(off(base - jnp.int32(h)))
            bot_args.append(off(base + jnp.int32(local - 2 * h)))
        out_t = kern(*top_args)
        out_b = kern(*bot_args)

        def stitch(i, t, b):
            return jnp.concatenate(
                [t[h : 2 * h, :], i[h : local - h, :], b[h : 2 * h, :]],
                axis=0,
            )

        if want_residual:
            return (
                stitch(out_i[0], out_t[0], out_b[0]),
                stitch(out_i[1], out_t[1], out_b[1]),
            )
        return stitch(out_i, out_t, out_b)

    run = functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec,) * len(args),
        out_specs=(spec,) * n_out if want_residual else spec,
        # pallas_call's out_shape ShapeDtypeStructs carry no vma annotation;
        # every operand/output here varies over all mesh axes by construction
        check_vma=False,
    )(run_overlap if overlap else run_plain)

    out = run(*args)
    unpad = lambda a: a[:rows, :] if rows_p != rows else a
    if want_residual:
        u_new, res = out
        return unpad(u_new), unpad(res)
    return unpad(out), None
