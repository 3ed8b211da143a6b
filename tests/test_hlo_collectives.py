"""Compiled-HLO inspection of the sharded smoothing paths' collective
structure (VERDICT r3 weak #8).

The whole sharded design rests on ONE structural claim (RESULTS.md round 3,
"Sharded fused smoothing"): the rows-layout fused Pallas path batches the
entire smooth block's communication into a SINGLE deep-halo exchange round
(all ppermutes independent, flying concurrently), while the GSPMD jnp path
pays one sequential one-cell exchange round per color pass — 2·nsweeps (+1
for the trailing residual) latency-bound ICI rounds per block.  Multi-chip
hardware is not reachable here, but the ROUND COUNT is a property of the
compiled program, checkable on the 8-virtual-device CPU mesh: these tests
parse the compiled HLO's def-use graph and measure the longest dependency
chain of collective-permute ops.  If either path regresses (the fused path
to per-color exchanges, or GSPMD to something even more serial), the depth
changes and the test fails.

Reference analog: gs.cu:344-366 amortizes global-memory latency into one
shared-memory tile load per block; the deep-halo round is the same
amortization at the ICI level.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpcclassmultigridproject_tpu.ops.pallas.smoother as psm
from hpcclassmultigridproject_tpu.core.layout import pad_field
from hpcclassmultigridproject_tpu.mg.levels import build_fine_level
from hpcclassmultigridproject_tpu.ops import padded as pops
from hpcclassmultigridproject_tpu.parallel import make_mesh
from hpcclassmultigridproject_tpu.parallel.pallas_halo import (
    fused_smooth_sharded,
    rows_spec,
)
from jax.sharding import NamedSharding

RNG = np.random.default_rng(4)
NSWEEPS = 3  # NITER, multigrid.cpp:41


def _collective_permute_stats(hlo_text: str) -> tuple[int, int]:
    """(count, longest dependency chain) of collective-permute instructions.

    HLO text lists instructions in def-before-use order per computation, so
    one forward pass over `%name = type op(operands...)` lines propagates
    the max number of collective-permutes on any path into each value.
    Fusion-body computations have no collectives (XLA never fuses them), so
    treating a call's operands as its only dependencies is exact here.
    """
    depth: dict[str, int] = {}
    count = 0
    max_depth = 0
    line_re = re.compile(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\S+\s+([\w\-]+)\((.*)")
    for line in hlo_text.splitlines():
        m = line_re.match(line)
        if not m:
            continue
        name, op, rest = m.groups()
        deps = re.findall(r"%([\w.\-]+)", rest)
        is_coll = op.startswith("collective-permute")
        count += is_coll
        d = (1 if is_coll else 0) + max([depth.get(x, 0) for x in deps] or [0])
        depth[name] = d
        max_depth = max(max_depth, d)
    return count, max_depth


def _setup(n):
    # n = 127: padded rows = 128, divisible by the 8-device row multiple
    # (lcm(2*8, 8) = 16), so the pad in fused_smooth_sharded is a no-op and
    # the compiled program contains ONLY the halo-exchange collectives
    shape = (n + 1, n + 1)
    v1 = jnp.asarray(RNG.standard_normal(shape), jnp.float32)
    v2 = jnp.asarray(RNG.standard_normal(shape), jnp.float32)
    level = build_fine_level(v1, v2, (1.0 / n) / 10, -4e-4, dtype=jnp.float32)
    u = pad_field(jnp.asarray(RNG.standard_normal(shape), jnp.float32))
    rhs = pad_field(jnp.asarray(RNG.standard_normal(shape), jnp.float32))
    return level, u, rhs


def test_fused_rows_path_is_one_exchange_round():
    """The production sharded smooth block (parallel/pallas_halo.py) must
    compile to exactly one concurrent deep-halo round: 2 ppermutes per
    exchanged operand — (u, rhs, v1, v2) for a from_v level — and a
    collective dependency chain of depth 1 (no collective waits on another
    collective)."""
    level, u, rhs = _setup(127)
    mesh = make_mesh()
    old = psm.INTERPRET
    psm.INTERPRET = True  # pallas_call must lower on the CPU backend
    try:
        f = jax.jit(
            lambda l, a, b: fused_smooth_sharded(
                mesh, l, a, b, NSWEEPS, want_residual=True
            )
        )
        text = f.lower(level, u, rhs).compile().as_text()
    finally:
        psm.INTERPRET = old
    count, depth = _collective_permute_stats(text)
    assert count == 8, f"expected 2 ppermutes x 4 operands, got {count}"
    assert depth == 1, (
        f"deep-halo exchange must be ONE concurrent round; compiled chain "
        f"depth {depth} means collectives serialized"
    )


def test_gspmd_rows_path_pays_per_color_rounds():
    """The GSPMD jnp smoother under the same rows sharding pays one
    sequential exchange round per color pass plus one for the trailing
    residual: collective chain depth exactly 2*nsweeps + 1.  Pins the
    baseline the fused path's single round is measured against (if GSPMD
    ever learns deep halos, the modeled ICI advantage must be re-derived)."""
    level, u, rhs = _setup(127)
    mesh = make_mesh()
    sh = NamedSharding(mesh, rows_spec(mesh))

    def gspmd(l, a, b):
        a = jax.lax.with_sharding_constraint(a, sh)
        b = jax.lax.with_sharding_constraint(b, sh)
        for _ in range(NSWEEPS):
            a = pops.rb_gauss_seidel(l, a, b)
        r = pops.residual(l, a, b)
        return (
            jax.lax.with_sharding_constraint(a, sh),
            jax.lax.with_sharding_constraint(r, sh),
        )

    text = jax.jit(gspmd).lower(level, u, rhs).compile().as_text()
    count, depth = _collective_permute_stats(text)
    assert depth == 2 * NSWEEPS + 1, (
        f"GSPMD rows smoothing should serialize one exchange round per "
        f"color pass (+1 residual): expected depth {2 * NSWEEPS + 1}, "
        f"got {depth}"
    )
    assert count == 2 * (2 * NSWEEPS + 1), (
        f"expected 2 ppermutes per round, got {count} total"
    )
