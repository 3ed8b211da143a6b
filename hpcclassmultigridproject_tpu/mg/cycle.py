"""Multigrid cycling: V/W-cycles, coarse solves, and the outer solver loop.

TPU-first design notes:
  * The level count is static, so the reference's recursive `mg_inner`
    (multigrid.cpp:17-92) unrolls at trace time into a flat XLA program —
    no dynamic control flow across levels.
  * The outer convergence loop (`mg_outer`, multigrid.cpp:97-120) and the
    coarsest-level iterated-GS solve (multigrid.cpp:55-65) are
    `lax.while_loop`s: no host round-trips per iteration (the reference CUDA
    version syncs device→host for *every* norm, up to 1000 times per coarse
    visit, multigrid.cu:64-69 — the while_loop keeps all of it on-chip).
  * The optional "dense" coarse solve replaces up to 1000 GS sweeps with one
    precomputed-inverse matmul on the MXU (the exact solve the reference
    abandoned, exact_solve.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hpcclassmultigridproject_tpu.config import SolverConfig
from hpcclassmultigridproject_tpu.mg.levels import Level
from hpcclassmultigridproject_tpu.ops.padded import (
    chebyshev_smooth,
    interior_norm,
    prolong_bilinear,
    rb_gauss_seidel,
    residual,
    restrict_full_weighting,
    restrict_inject,
    weighted_jacobi,
)


def _get_smoother(cfg: SolverConfig):
    if cfg.smoother == "rbgs":
        return rb_gauss_seidel
    if cfg.smoother == "jacobi":
        return lambda level, u, rhs: weighted_jacobi(level, u, rhs, cfg.jacobi_omega)
    if cfg.smoother == "chebyshev":
        return lambda level, u, rhs: chebyshev_smooth(
            level, u, rhs, cfg.cheby_degree, cfg.cheby_lower, cfg.cheby_upper
        )
    raise ValueError(f"unknown smoother {cfg.smoother!r}")


# Smallest level extent at which backend="auto" routes through the fused
# Pallas smoother on TPU.  Measured on v5e (RESULTS.md): the fused kernel
# wins at EVERY size — 2.9x at n=32, 1.3x at n=1024, 4.5x at n=2048 (where
# XLA's fusion of the 6-color-pass jnp form falls apart) — so no floor.
# Applies to ISOLATED / top-level smooth blocks, where the kernel's per-op
# win is real.
_AUTO_PALLAS_MIN_N = 0

# IN-CYCLE coarse routing knob (VERDICT r4 next #2) — RESOLVED BY
# MEASUREMENT, default OFF.  Round 4's tower A/B showed the N=1024 V-cycle
# flagship 6 ms faster with the jnp sub-tower below n=512 than with
# per-level Pallas (53.6 vs 59.8 ms), and the verdict asked to propagate
# that to tower-INELIGIBLE configs.  Round 5 built the routing (auto sends
# in-cycle 5-point levels strictly below this extent to jnp) and PRICED it
# on every tower-ineligible config — the hypothesis did not survive
# contact (bench_data/incycle.jsonl, galerkin.jsonl, 2026-08-21, all
# same-process min-of-5):
#
#   W-cycle:        all-pallas 0.1174 s   jnp<512 0.1273 s   jnp<=512 0.1453 s
#   full-weighting: all-pallas 0.0546 s   jnp<512 0.0566 s   jnp<=512 0.0686 s
#   Galerkin:       all-pallas 0.0669 s   jnp coarse 0.0735 s
#
# The round-4 win was specific to the V-shaped inject-restriction
# sub-tower — exactly the structure the coarse-tower megakernel already
# replaces in production.  In W-cycle / full-weighting / Galerkin
# arrangements XLA's fusion of the jnp sub-tower is broken up by the extra
# transfers/corner bands and per-level Pallas wins everywhere.  0 disables
# the routing (per-level Pallas, the measured winner); the knob and the
# A/B script (scripts/ab_incycle_tpu.py) remain for re-pricing on future
# hardware.
_AUTO_JNP_MAX_INCYCLE_N = 0

# Fold the prolonged coarse correction into the post-smooth kernel's window
# reads (fused_rb_sweeps(corr=...)) instead of a separate u+corr add pass.
# Bit-identical to add-then-smooth (tests/test_pallas.py); A/B'd on-chip by
# scripts/ab_fusecorr_tpu.py (RESULTS.md round 3).  Trace-time flag.
_FUSE_CORR = True

# Route the whole sub-cycle below ops/pallas/tower.py::TOWER_MAX_N through
# the coarse-tower megakernel pair (descent + ascent Pallas programs around
# the XLA dense coarse matmul) instead of ~25 per-level launches.
# Trace-time flag for A/B bisection.
_USE_TOWER = True

# Pre-fuse the injection restriction's row decimation into the fused
# smoother's residual output (halves the residual write + restrict read).
# Trace-time flag for A/B bisection.
_RESTRICT_DEC = True


def _tower_eligible(cfg: SolverConfig, levels, lvl: int, shardings,
                    u_is_zero: bool) -> bool:
    """The megakernel covers a correction solve (zero iterate) over a
    V-shaped (shape=1) sub-tower of 5-point cn_from_v levels ending in a
    dense coarse solve, unsharded from the entry level down."""
    if not _USE_TOWER or not u_is_zero or lvl == 0 or lvl >= len(levels) - 1:
        return False
    from hpcclassmultigridproject_tpu.ops.pallas.tower import TOWER_MAX_N

    if levels[lvl].n > TOWER_MAX_N:
        return False
    if (cfg.cycle_shape != 1 or cfg.restriction != "inject"
            or cfg.coarse_mode != "dense" or levels[-1].a_inv is None):
        return False
    for l in levels[lvl:-1]:
        if (not getattr(l, "cn_from_v", False) or l.diag is not None
                or l.ne is not None):
            return False
    if shardings is not None:
        for s in shardings[lvl:]:
            if len(s.spec) > 0:
                return False
    # backend gate WITHOUT the per-level banded-smoother floor
    # (_AUTO_PALLAS_MIN_N governs where the banded kernel beats jnp per op;
    # the tower replaces the whole sub-cycle, a different trade)
    import numpy as np

    if cfg.smoother != "rbgs":
        return False
    if np.dtype(cfg.dtype).itemsize != 4:
        return False
    if cfg.backend == "pallas":
        return True
    if cfg.backend != "auto":
        return False
    import jax

    return jax.default_backend() == "tpu"


def _pallas_backend_ok(cfg: SolverConfig, level: Level,
                       in_cycle: bool = False) -> bool:
    """Backend/dtype/hardware gate shared by the single-device and sharded
    fused-Pallas paths (the operator-shape gates differ per path: the
    single-device kernel handles both 5-point and Galerkin 9-point levels
    since round 4; the sharded deep-halo path is 5-point only)."""
    import numpy as np

    if cfg.smoother != "rbgs":
        return False
    if cfg.backend == "pallas":
        # explicit pallas is the interpret-mode test hook but also reachable
        # by users: refuse f64-family dtypes on a real TPU with a readable
        # error instead of a Mosaic lowering failure (VERDICT r2 weak #6)
        from hpcclassmultigridproject_tpu.ops.pallas import smoother as _psm

        import jax

        if (not _psm.INTERPRET and jax.default_backend() == "tpu"
                and np.dtype(cfg.dtype).itemsize == 8):
            raise ValueError(
                "backend='pallas' requires an f32-family dtype on real TPU "
                "(Mosaic cannot lower f64 kernels); use dtype=float32 — with "
                "refine_dtype=float64 for high-precision certificates — or "
                "backend='jnp'/'auto'"
            )
        return True
    if cfg.backend != "auto":
        return False
    # auto: only where measured profitable — real TPU (explicit
    # backend="pallas" is the interpret-mode test hook), f32, level at least
    # the measured floor; IN-CYCLE coarse levels below the measured
    # tower-ineligible crossover go jnp (see _AUTO_JNP_MAX_INCYCLE_N)
    if level.n < _AUTO_PALLAS_MIN_N:
        return False
    if (in_cycle and level.n < _AUTO_JNP_MAX_INCYCLE_N
            and getattr(level, "ne", None) is None
            and getattr(level, "diag", None) is None):
        # STRICT: the round-4 winning arrangement keeps the fused kernel AT
        # n=512 and routes jnp strictly below it (the n=512 A/B with jnp at
        # 512 too measured WORSE on-chip — bench_data/incycle.jsonl round
        # 5).  Galerkin (nine-band) levels are EXEMPT: their jnp form is a
        # 9-point varying-diagonal stencil whose fused XLA sub-tower
        # measured worse than the nine-band kernel (galerkin.jsonl round 5:
        # 0.0669 all-pallas vs 0.0735 jnp-coarse).
        return False
    if np.dtype(cfg.dtype).itemsize != 4:
        return False
    import jax

    return jax.default_backend() == "tpu"


def _pallas_eligible(cfg: SolverConfig, level: Level, sharded: bool,
                     in_cycle: bool = False) -> bool:
    """Single-device fused kernel: additionally requires an unsharded level
    (pallas_call cannot be block-partitioned by GSPMD; sharded levels go
    through _pallas_sharded_eligible's explicit shard_map path instead).

    `in_cycle=True` marks a coarse-level smooth block inside an mg_cycle
    recursion (lvl > 0): auto additionally applies the measured jnp
    crossover (_AUTO_JNP_MAX_INCYCLE_N)."""
    if sharded:
        return False
    return _pallas_backend_ok(cfg, level, in_cycle=in_cycle)


def _pallas_sharded_eligible(cfg: SolverConfig, level: Level, sharding) -> bool:
    """Sharded fused path (parallel/pallas_halo.py): rows-only partitioned
    5-point levels whose per-device block clears the halo cascade depth."""
    if sharding is None or not _pallas_backend_ok(cfg, level):
        return False
    if level.diag is not None or level.ne is not None:
        # Galerkin 9-point levels: single-device kernel only (they are
        # coarse levels and agglomerate/replicate under distribution)
        return False
    from hpcclassmultigridproject_tpu.parallel.pallas_halo import (
        is_rows_sharding,
        padded_rows_for,
    )
    from hpcclassmultigridproject_tpu.ops.pallas.smoother import _halo

    if not is_rows_sharding(sharding):
        return False
    import math

    mesh = sharding.mesh
    ndev = math.prod(mesh.shape[a] for a in mesh.axis_names)
    rows = level.padded[0]
    return padded_rows_for(rows, ndev) // ndev >= 2 * _halo(cfg.niter)


def _smooth_block(cfg: SolverConfig, level: Level, u, rhs, nsweeps: int,
                  want_residual: bool, sharding=None,
                  u_is_zero: bool = False, corr=None,
                  residual_rows_decimated: bool = False,
                  in_cycle: bool = False):
    """`nsweeps` smoother sweeps, optionally fused with the trailing residual.

    backend "pallas" routes red–black GS through the fused Pallas kernel
    (ops/pallas/smoother.py — one HBM pass for the whole block); "jnp" uses
    the padded jnp kernels; "auto" picks the measured winner per level
    (RESULTS.md).  Pallas requires TPU (or INTERPRET mode) and an f32-family
    dtype.

    `sharding` is the level's NamedSharding when it is actually partitioned
    (None otherwise).  Rows-partitioned 5-point levels route through the
    sharded fused kernel — shard_map + deep-halo ppermute exchange
    (parallel/pallas_halo.py).  Unsharded Galerkin levels (spatially-varying
    `diag` / 9-point corner bands, sparse/galerkin.py) use the fused
    kernel's nine-band form (round 4, VERDICT r3 weak #7); 2-D-partitioned
    levels and SHARDED Galerkin levels fall back to the jnp path under
    GSPMD (the deep-halo exchange ships 5-point operands only, and Galerkin
    levels are coarse — they agglomerate under distribution anyway).
    """
    sharded = sharding is not None
    if _pallas_eligible(cfg, level, sharded, in_cycle=in_cycle):
        from hpcclassmultigridproject_tpu.ops.pallas.smoother import fused_rb_sweeps

        if corr is not None and _FUSE_CORR:
            # post-smooth after coarse correction: fold u+corr into the
            # kernel's own window reads (no separate add pass)
            return fused_rb_sweeps(level, u, rhs, nsweeps, want_residual,
                                   corr=corr)
        if corr is not None:
            u = u + corr
        # u_is_zero: skip materializing+reading the zeros iterate (every
        # correction solve and delta opening starts from zero)
        return fused_rb_sweeps(
            level, u, rhs, nsweeps, want_residual, zero_init=u_is_zero,
            residual_rows_decimated=residual_rows_decimated,
        )
    assert not residual_rows_decimated, (
        "decimated residual is only produced by the single-device fused "
        "kernel; caller must gate on _pallas_eligible"
    )
    if corr is not None:
        u = u + corr
    if sharded and _pallas_sharded_eligible(cfg, level, sharding):
        from hpcclassmultigridproject_tpu.parallel.pallas_halo import (
            fused_smooth_sharded,
        )

        return fused_smooth_sharded(
            sharding.mesh, level, u, rhs, nsweeps, want_residual,
            zero_init=u_is_zero, overlap=cfg.sharded_overlap,
        )
    smoother = _get_smoother(cfg)
    for _ in range(nsweeps):
        u = smoother(level, u, rhs)
    return u, (residual(level, u, rhs) if want_residual else None)


def _restrict(cfg: SolverConfig, res, coarse_level: Level):
    shape = coarse_level.padded
    if cfg.restriction == "inject":
        return restrict_inject(res, shape)
    if cfg.restriction == "full":
        return restrict_full_weighting(res, shape, coarse_level.n)
    raise ValueError(f"unknown restriction {cfg.restriction!r}")


def coarse_solve_gs(level: Level, u, rhs, cfg: SolverConfig, smoother):
    """Coarsest-level solve by smoothing to absolute residual `coarse_tol`
    (≤ `coarse_maxiter` sweeps) — multigrid.cpp:55-65 semantics exactly:
    check-before-sweep with an initial placeholder residual of 1.0."""
    norm_dtype = jnp.promote_types(u.dtype, jnp.float32)
    one = jnp.asarray(1.0, dtype=norm_dtype)

    def cond(carry):
        _, res, it = carry
        return (it < cfg.coarse_maxiter) & (res > cfg.coarse_tol)

    def body(carry):
        u, _, it = carry
        u = smoother(level, u, rhs)
        res = interior_norm(residual(level, u, rhs))
        return u, res, it + 1

    u, _, _ = jax.lax.while_loop(cond, body, (u, one, jnp.int32(0)))
    return u


def coarse_solve_dense(level: Level, u, rhs):
    """Exact coarse solve: one MXU matmul with the precomputed interior
    inverse (the solve exact_solve.cpp abandoned).  The initial guess is
    irrelevant (the solve is exact)."""
    n, m = level.n, level.n - 1
    flat = rhs[1:n, 1:n].reshape(m * m)
    sol = (level.a_inv @ flat).reshape(m, m)
    return jnp.zeros_like(rhs).at[1:n, 1:n].set(sol)


def _constrain(x, sharding):
    if sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)


def mg_cycle(
    levels: tuple[Level, ...],
    u,
    rhs,
    cfg: SolverConfig,
    lvl: int = 0,
    shardings=None,
    want_final_residual: bool = False,
    u_is_zero: bool = False,
):
    """One V- or W-cycle starting at `lvl` (multigrid.cpp:17-92).

    cycle_shape=1 → V, 2 → W; the shape loop wraps the whole level body
    including the coarsest solve, exactly as the reference's `for sh` loop
    (multigrid.cpp:52).

    `shardings` (optional, one per level) places sharding constraints at the
    level transitions — the restrict/prolong boundaries are where GSPMD
    reshards, implementing coarse-level agglomeration (parallel/sharding.py).

    `want_final_residual` (top level only): also return rhs − A·u of the
    returned iterate, fused into the last post-smooth block (free second
    output of the Pallas kernel vs a separate full stencil pass) — returns
    (u, res) instead of u.
    """
    if (not want_final_residual
            and _tower_eligible(cfg, levels, lvl, shardings, u_is_zero)):
        # the whole sub-cycle from here down runs as two Pallas megakernel
        # programs around the dense coarse matmul (ops/pallas/tower.py) —
        # the fused form of the ~25 tiny per-level launches this recursion
        # would otherwise emit (RESULTS.md round-4 coarse-tower attack)
        from hpcclassmultigridproject_tpu.ops.pallas.tower import tower_vcycle

        return tower_vcycle(levels, lvl, rhs, cfg)

    level = levels[lvl]
    smoother = _get_smoother(cfg)
    shard = None if shardings is None else shardings[lvl]
    shard_c = None if shardings is None else shardings[lvl + 1] if lvl + 1 < len(levels) else None
    # a level is "sharded" when its spec actually partitions (replicated
    # P() levels run the whole grid per chip and may use the Pallas path)
    sharded = shard is not None and len(shard.spec) > 0
    res = None

    for sh in range(cfg.cycle_shape):
        last_pass = sh == cfg.cycle_shape - 1
        if lvl == len(levels) - 1:
            if cfg.coarse_mode == "dense" and level.a_inv is not None:
                u = coarse_solve_dense(level, u, rhs)
            else:
                u = coarse_solve_gs(level, u, rhs, cfg, smoother)
            if want_final_residual and last_pass:
                res = residual(level, u, rhs)
        else:
            # pre-fuse the restriction's ROW decimation into the smoother's
            # residual output where the fused kernel runs (injection only;
            # halves the residual write + the restrict read — round 4)
            res_dec = (_RESTRICT_DEC and cfg.restriction == "inject"
                       and not sharded
                       and _pallas_eligible(cfg, level, sharded,
                                            in_cycle=lvl > 0))
            u, r0 = _smooth_block(cfg, level, u, rhs, cfg.niter, True,
                                  sharding=shard if sharded else None,
                                  u_is_zero=u_is_zero and sh == 0,
                                  residual_rows_decimated=res_dec,
                                  in_cycle=lvl > 0)
            if res_dec:
                from hpcclassmultigridproject_tpu.ops.padded import (
                    restrict_inject_rows_decimated,
                )

                rhs_c = _constrain(
                    restrict_inject_rows_decimated(
                        r0, levels[lvl + 1].padded
                    ),
                    shard_c,
                )
            else:
                rhs_c = _constrain(_restrict(cfg, r0, levels[lvl + 1]),
                                   shard_c)
            u_c = jnp.zeros_like(rhs_c)
            u_c = mg_cycle(levels, u_c, rhs_c, cfg, lvl + 1, shardings,
                           u_is_zero=True)
            corr = _constrain(prolong_bilinear(u_c, level.padded), shard)
            u, res = _smooth_block(
                cfg, level, u, rhs, cfg.niter,
                want_final_residual and last_pass,
                sharding=shard if sharded else None,
                corr=corr,
                in_cycle=lvl > 0,
            )
    if want_final_residual:
        return u, res
    return u


def mg_solve(levels: tuple[Level, ...], u, rhs, cfg: SolverConfig, shardings=None):
    """Solve A u = rhs by repeated cycles until rel. residual ≤ tol or
    `max_cycles` cycles (multigrid.cpp:97-120).

    Returns (u, stats) with stats = {"cycles", "rel_residual", "converged"}.

    The tol comparison runs in the norm's accumulation dtype (f32 for f32
    fields, f64 under x64) — never downcast, so tolerances below the f32
    resolution (~1e-7 relative) remain meaningful in f64 mode.
    """
    fine = levels[0]
    res0 = interior_norm(residual(fine, u, rhs))
    res0_safe = jnp.maximum(res0, jnp.finfo(res0.dtype).tiny)

    def cond(carry):
        _, res, it = carry
        return (it < cfg.max_cycles) & (res / res0_safe > cfg.tol)

    def body(carry):
        u, _, it = carry
        u = mg_cycle(levels, u, rhs, cfg, shardings=shardings)
        res = interior_norm(residual(fine, u, rhs))
        return u, res, it + 1

    u, res, cycles = jax.lax.while_loop(cond, body, (u, res0, jnp.int32(0)))
    rel = res / res0_safe
    stats = {
        "cycles": cycles,
        "rel_residual": rel,
        # the reference's warning check is off by one (== MAX_CYCLE-1,
        # multigrid.cpp:117, SURVEY §2.9.5); this is the intended test
        "converged": rel <= cfg.tol,
    }
    return u, stats


def mg_solve_fixed(
    levels: tuple[Level, ...], u, rhs, cfg: SolverConfig, shardings=None
):
    """Solve A u = rhs with exactly `cfg.num_cycles` cycles — the TPU fast
    path: no data-dependent control flow, so the whole solve is a straight
    fused XLA program (the axon/TPU compiler handles while_loop-free programs
    orders of magnitude better, and 1 cycle suffices at the reference's
    default parameters anyway — SURVEY §0 "convergence is instant").

    The relative-residual certificate is still computed and returned in
    stats, so callers can verify the reference tolerance was met.  Like
    mg_solve, the certificate stays in the norm's accumulation dtype.
    """
    fine = levels[0]
    res0 = interior_norm(residual(fine, u, rhs))
    res0_safe = jnp.maximum(res0, jnp.finfo(res0.dtype).tiny)
    for _ in range(cfg.num_cycles):
        u = mg_cycle(levels, u, rhs, cfg, shardings=shardings)
    rel = interior_norm(residual(fine, u, rhs)) / res0_safe
    stats = {
        "cycles": jnp.int32(cfg.num_cycles),
        "rel_residual": rel,
        "converged": rel <= cfg.tol,
    }
    return u, stats


def fmg_iterate(levels: tuple[Level, ...], rhs, cfg: SolverConfig, shardings=None):
    """The FMG ascent itself (no certificate): restrict `rhs` down the tower,
    solve the coarsest level, prolong upward running `cfg.num_cycles` cycles
    per level.  Shared by `fmg_solve` and the refined path's FMG opening
    (mg/refine.py)."""
    # restrict the rhs to every level (injection or full weighting, per cfg)
    rhs_l = [rhs]
    for lvl in range(1, len(levels)):
        rhs_l.append(_constrain(
            _restrict(cfg, rhs_l[-1], levels[lvl]),
            None if shardings is None else shardings[lvl],
        ))

    # coarsest solve
    bottom = levels[-1]
    smoother = _get_smoother(cfg)
    if cfg.coarse_mode == "dense" and bottom.a_inv is not None:
        v = coarse_solve_dense(bottom, jnp.zeros_like(rhs_l[-1]), rhs_l[-1])
    else:
        v = coarse_solve_gs(bottom, jnp.zeros_like(rhs_l[-1]), rhs_l[-1], cfg, smoother)

    # ascend: prolong the solution, then cycle at that level
    for lvl in range(len(levels) - 2, -1, -1):
        shard = None if shardings is None else shardings[lvl]
        v = _constrain(prolong_bilinear(v, levels[lvl].padded), shard)
        for _ in range(cfg.num_cycles):
            v = mg_cycle(levels, v, rhs_l[lvl], cfg, lvl=lvl, shardings=shardings)
    return v


def fmg_solve(
    levels: tuple[Level, ...], u, rhs, cfg: SolverConfig, shardings=None
):
    """Full multigrid (FMG / nested iteration): restrict the rhs down the
    tower, solve the coarsest level, then work back up — at each level the
    prolonged coarse solution seeds `cfg.num_cycles` cycles.

    New capability beyond the reference (which always starts cycles from the
    previous timestep's fine-grid state, multigrid.cpp:108-114).  FMG costs
    ~4/3 of one fine V-cycle yet delivers a discretization-accuracy first
    iterate, making it the right opening move for cold starts (t = 0, or
    checkpoint-restart with no history).  The initial guess `u` only
    contributes via the residual-norm baseline of the certificate; the FMG
    iterate replaces it.

    Like `mg_solve_fixed` this is a scan-only (while_loop-free) program; the
    relative-residual certificate is computed against `u`'s initial residual
    and returned in stats.
    """
    fine = levels[0]
    res0 = interior_norm(residual(fine, u, rhs))
    res0_safe = jnp.maximum(res0, jnp.finfo(res0.dtype).tiny)
    v = fmg_iterate(levels, rhs, cfg, shardings=shardings)
    rel = interior_norm(residual(fine, v, rhs)) / res0_safe
    stats = {
        # total cycles performed across the ascent: num_cycles at each of the
        # (num_levels - 1) non-coarsest levels (the coarsest direct solve is
        # not a cycle)
        "cycles": jnp.int32(cfg.num_cycles * (len(levels) - 1)),
        "rel_residual": rel,
        "converged": rel <= cfg.tol,
    }
    return v, stats
