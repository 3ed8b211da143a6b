"""Explicit halo-exchange smoothing under shard_map.

The production distributed path (parallel/sharding.py) follows the
scaling-book recipe — annotate shardings, let GSPMD turn the stencil's
shifted reads into ICI halo exchanges.  This module is the EXPLICIT
counterpart: the one-cell halo exchange is written out as `lax.ppermute`
neighbor sends along the mesh axes, and the red–black sweep runs on local
blocks.  It exists because (a) SURVEY §2.8 names neighbor-wise halo exchange
as the TPU-equivalent of the reference's parallelism and an explicit form
makes the communication pattern inspectable/tunable (e.g. for manual
compute/communication overlap), and (b) it pins GSPMD's behavior: the suite
asserts both paths produce identical sweeps on the multi-device CPU mesh.

ppermute fills devices that receive no message with zeros, which exactly
matches the padded layout's zero margins at the grid edges — edge devices
need no special-casing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _from_prev(x, axis: str):
    """Receive from the previous device along `axis` (first device gets 0)."""
    n = jax.lax.axis_size(axis)
    return jax.lax.ppermute(x, axis, [(i, i + 1) for i in range(n - 1)])


def _from_next(x, axis: str):
    """Receive from the next device along `axis` (last device gets 0)."""
    n = jax.lax.axis_size(axis)
    return jax.lax.ppermute(x, axis, [(i + 1, i) for i in range(n - 1)])


def _halo_shifts(u, ax_x: str, ax_y: str):
    """The four one-cell shifted views of the GLOBAL field, built from the
    local block plus ppermute'd halo lines.

    Returns (up, down, left, right) where up[i,j] = u_global[i-1,j] etc.,
    all local-block shaped.
    """
    top = _from_prev(u[-1:, :], ax_x)        # previous block's last row
    bot = _from_next(u[:1, :], ax_x)         # next block's first row
    lef = _from_prev(u[:, -1:], ax_y)
    rig = _from_next(u[:, :1], ax_y)
    up = jnp.concatenate([top, u[:-1, :]], axis=0)
    dn = jnp.concatenate([u[1:, :], bot], axis=0)
    lf = jnp.concatenate([lef, u[:, :-1]], axis=1)
    rt = jnp.concatenate([u[:, 1:], rig], axis=1)
    return up, dn, lf, rt


def _local_color_mask(shape, parity: int, ax_x: str, ax_y: str):
    """Global (i+j) parity mask evaluated on a local block: the block's
    global origin comes from the device's mesh coordinates."""
    ox = jax.lax.axis_index(ax_x) * shape[0]
    oy = jax.lax.axis_index(ax_y) * shape[1]
    r = jnp.arange(shape[0], dtype=jnp.int32)[:, None] + ox
    c = jnp.arange(shape[1], dtype=jnp.int32)[None, :] + oy
    return (r + c) % 2 == parity


def _sweep_local(level_blk, u, rhs, ax_x: str, ax_y: str):
    """One full red–black sweep on a local block with explicit halos.

    Two ppermute rounds per sweep: black must read the freshly updated red
    halo lines (the reference's inter-color barrier, gs.cu:389-391).
    """
    inv_diag = 1.0 / level_blk.diag_a if level_blk.diag is None else 1.0 / level_blk.diag

    def color_pass(u, parity):
        up, dn, lf, rt = _halo_shifts(u, ax_x, ax_y)
        nb = level_blk.cc * up + level_blk.dd * dn + level_blk.aa * lf + level_blk.bb * rt
        mask = _local_color_mask(u.shape, parity, ax_x, ax_y)
        return jnp.where(mask, (rhs - nb) * inv_diag, u)

    u = color_pass(u, 0)
    u = color_pass(u, 1)
    return u


def _residual_local(level_blk, u, rhs, ax_x: str, ax_y: str):
    up, dn, lf, rt = _halo_shifts(u, ax_x, ax_y)
    nb = level_blk.cc * up + level_blk.dd * dn + level_blk.aa * lf + level_blk.bb * rt
    diag = level_blk.diag_a if level_blk.diag is None else level_blk.diag
    return rhs - diag * u - nb


def smooth_distributed(
    mesh: Mesh,
    level,
    u: jnp.ndarray,
    rhs: jnp.ndarray,
    nsweeps: int = 1,
    want_residual: bool = False,
):
    """`nsweeps` red–black sweeps (+ optional residual and its psum'd norm)
    with explicit shard_map halo exchange over `mesh`.

    Equivalent to the jnp padded smoother under GSPMD sharding
    (tests/test_halo.py asserts bitwise agreement); 5-point levels only.
    """
    if level.diag is not None or level.ne is not None:
        raise NotImplementedError(
            "explicit halo smoothing supports 5-point levels only "
            "(Galerkin 9-point levels run under the GSPMD path)"
        )
    ax_x, ax_y = mesh.axis_names
    spec = P(ax_x, ax_y)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=(spec, spec, P()) if want_residual else spec,
    )
    def run(aa, bb, cc, dd, u, rhs):
        import dataclasses as _dc

        blk = _dc.replace(level, aa=aa, bb=bb, cc=cc, dd=dd,
                          v1=aa, v2=aa, a_inv=None)
        for _ in range(nsweeps):
            u = _sweep_local(blk, u, rhs, ax_x, ax_y)
        if not want_residual:
            return u
        res = _residual_local(blk, u, rhs, ax_x, ax_y)
        acc = res.astype(jnp.promote_types(res.dtype, jnp.float32))
        norm = jnp.sqrt(jax.lax.psum(jnp.sum(acc * acc), (ax_x, ax_y)))
        return u, res, norm

    sharding = NamedSharding(mesh, spec)
    put = lambda a: jax.lax.with_sharding_constraint(a, sharding)
    args = (level.aa, level.bb, level.cc, level.dd, u, rhs)
    return run(*(put(a) for a in args))
