"""Delta (incremental) Crank–Nicolson stepping — f32 compute/storage, f64
accuracy.

The direct CN step solves A u^{n+1} = B u^n, whose right-hand side is O(u):
computing it to double accuracy costs one emulated-f64 fine-grid stencil per
step, which dominates the refined step on TPU (RESULTS.md profile: ~63%).

Algebraically the same step is

    A δ = (B − A) u^n = dt·L u^n,      u^{n+1} = u^n + δ

(A = I − (dt/2)L, B = I + (dt/2)L, multigrid.cpp:1-2 discretization).  The
increment δ is O(dt·u) ≈ 3e-3·u at the reference defaults, so the delta
system can be computed and solved in f32 — IF the right-hand side is
evaluated without catastrophic cancellation.  Three ingredients:

1. **Difference-form rhs** (`delta_rhs`).  The naive coefficient form
   8rν·u − 2Σc·u sums O(0.1·u) terms that cancel to O(3e-3·u); its f32
   rounding (~1e-8·u ≈ 3e-6 of the result) BLOWS the 1e-6 contract (measured
   5.9e-6 at N=1024).  Rewriting per axis with aa+bb = 2rν, bb−aa = r·h·v:

       (B−A)u = −2·[ rν·Σ(u_nb − u)  +  (r·h/2)·(v1·(u_S−u_N) + v2·(u_E−u_W)) ]

   every subtraction is between NEIGHBORING node values (Sterbenz-exact or
   ε-relative-to-the-difference), so the f32 evaluation carries ~1e-7
   RELATIVE error — certificate floor ~2e-7, meeting tol = 1e-6.

2. **f32-pair state** (u ≈ hi + lo, |lo| ≤ ε|hi|).  HBM only ever moves f32
   arrays; the pair represents u to ~2^-47 relative.  The rhs needs the lo
   part's contribution too ((B−A)·lo ~ 6e-6·rhs-scale): evaluated with the
   same difference form and added.

3. **Register-f64 accumulation**: u^{n+1} = (hi + lo + δ) is summed in f64
   built inline from the f32 operands (reads/writes stay f32; the emulated-
   f64 adds are a few VPU ops per point, unlike the f64 STENCIL the direct
   form needs), then split back into (hi, lo) — correctly-rounded, no
   error-free-transformation tricks that compiler excess-precision could
   break.

Certificate semantics: the per-step relative residual is
||rhs_δ − A δ|| / ||rhs_δ|| — exactly the reference's mg_outer ratio
(multigrid.cpp:104-113: the initial iterate u^n has residual B u^n − A u^n),
measured in f32 at delta scale.  The epilogue recomputes the LAST step's
residual entirely in the high dtype from the reconstructed states and
returns it as stats["final_rel_residual_hi"] — the rigorous certificate.

No reference counterpart (the reference is uniformly double); gated by
SolverConfig.delta_form.  This is the stencil-world analog of
mixed-precision training's master-weights pattern, with the master itself
kept as an f32 pair.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hpcclassmultigridproject_tpu.config import SolverConfig
from hpcclassmultigridproject_tpu.core.layout import interior_mask, shift
from hpcclassmultigridproject_tpu.mg.cycle import mg_cycle
from hpcclassmultigridproject_tpu.mg.levels import Level
from hpcclassmultigridproject_tpu.ops.padded import (
    interior_norm,
    neighbor_sum_auto,
    residual_auto,
)

# Trace-time knob: route the accumulate+opening through the fused Pallas
# kernel (ops/pallas/delta_step.py) when eligible.  Module-level for A/B
# bisection (scripts, RESULTS.md round 3 fault hunt).
_FUSE_OPEN = True

# Whole-step opening (VERDICT r4 next #8): additionally fold the TOP-LEVEL
# pre-smooth block into the opening kernel (accumulate + delta rhs +
# zero-init cascade + decimated residual in ONE banded pass —
# ops/pallas/delta_step.py::fused_open_presmooth).  The separate kernels
# re-read (rhs_δ, v1, v2): three full-grid HBM reads + one launch saved per
# step.  Applies to the flagship arrangement only (1 V-cycle/step, inject
# restriction, unsharded, fused-eligible fine level); rhs_δ stays
# materialized for the post-smooth and the certificate norm.
#
# DEFAULT OFF — attempted and priced on-chip (bench_data/openfuse.jsonl,
# same-process min-of-7/9 at N=1024): under the narrow-tier 4 MB budget the
# 10-window working set drops the band to 72 rows and LOSES 1.2 ms/run;
# with a dedicated 6 MB budget (bh≈104) it is a WASH (0.0626 vs 0.0620).
# The ~17 µs/step of saved reads is repaid in cascade halo recompute at the
# thinner band.  Kernel, tests and scripts/ab_openfuse_tpu.py remain for
# re-pricing on hardware with more VMEM headroom (the estimated win stands
# where bh can stay at the separate kernels' 128).
_FUSE_OPEN_SMOOTH = False


def _dform(x):
    """Cancellation-free building blocks of (B−A)x: the 5-point Laplacian
    sum Σ(x_nb − x) and the two centered differences, every subtraction
    between neighboring values."""
    up, dn = shift(x, -1, 0), shift(x, 1, 0)     # x[i−1,j], x[i+1,j]
    lf, rt = shift(x, 0, -1), shift(x, 0, 1)     # x[i,j−1], x[i,j+1]
    lap = (up - x) + (dn - x) + (lf - x) + (rt - x)
    return lap, dn - up, rt - lf                 # lap, Δ_i x, Δ_j x


def delta_rhs(level: Level, u_hi, u_lo=None):
    """(B − A)(hi + lo) in difference form, f32 throughout.

    coefficient identities (gs.cpp:9-20): aa+bb = 2rν, bb−aa = r·h·v2,
    cc+dd = 2rν, dd−cc = r·h·v1 ⇒
    (B−A)u = −2rν·lap(u) − r·h·(v1·Δ_i u + v2·Δ_j u).
    Masked to the open interior (the difference form, unlike the zero-
    coefficient form, is nonzero at boundary/padding nodes).
    """
    rr = 0.5 * level.dt / (level.h * level.h)
    dtype = u_hi.dtype
    two_rnu = dtype.type(2.0 * rr * level.nu)
    r_h = dtype.type(rr * level.h)

    lap, di, dj = _dform(u_hi)
    if u_lo is not None:
        lap_l, di_l, dj_l = _dform(u_lo)
        lap, di, dj = lap + lap_l, di + di_l, dj + dj_l
    out = -(two_rnu * lap) - r_h * (level.v1 * di + level.v2 * dj)
    return out * interior_mask(level.n, u_hi.shape, dtype=dtype)


def _split_hi_lo(x64, dtype):
    hi = x64.astype(dtype)
    lo = (x64 - hi.astype(x64.dtype)).astype(dtype)
    return hi, lo


def _accumulate_via_hi(hi, lo, d, acc_dtype):
    """Reference accumulator: (hi + lo + d) summed in `acc_dtype` built
    inline from f32 operands, split back to an (hi, lo) pair.  Numerically
    canonical but pays ~8 emulated-f64 ops per point on TPU."""
    s = hi.astype(acc_dtype) + lo.astype(acc_dtype) + d.astype(acc_dtype)
    return _split_hi_lo(s, hi.dtype)


def _accumulate(hi, lo, d, acc_dtype):
    """Production accumulator: TwoSum + renormalization, pure f32 — no
    emulated-f64 ops at all.  Measured bit-identical to `_accumulate_via_hi`
    over the full flagship run (same center value, same f64 epilogue
    certificate to the last digit) and ~4 ms faster per 100 steps
    (RESULTS.md); equality is pinned by tests/test_refine.py.

    TwoSum (Knuth) is branch-free and exact in IEEE f32: t + err == hi + d
    exactly.  The err folds into lo, and a Fast2Sum renormalizes so
    |lo| stays ≤ ulp(hi).  (acc_dtype unused — kept for signature parity.)
    """
    t = hi + d
    bv = t - hi
    err = (hi - (t - bv)) + (d - bv)
    lo2 = lo + err
    hi2 = t + lo2
    lo3 = lo2 - (hi2 - t)
    return hi2, lo3


def timestepper_delta(
    levels: tuple[Level, ...],
    fine_hi: Level,
    u0: jnp.ndarray,
    num_steps: int,
    cfg: SolverConfig,
    shardings=None,
):
    """`num_steps` delta-form CN steps; returns (uT, per-step stats).

    `u0` is in the high dtype; uT is returned in the high dtype.  Stats
    match the refined stepper's, plus `final_rel_residual_hi` (the last
    step's residual recomputed entirely in the high dtype).
    """
    fine = levels[0]
    tiny = jnp.finfo(jnp.float32).tiny
    acc_dtype = u0.dtype
    hi0, lo0 = _split_hi_lo(u0, cfg.dtype)

    def constrain(x):
        if shardings is None:
            return x
        return jax.lax.with_sharding_constraint(x, shardings[0])

    from hpcclassmultigridproject_tpu.mg import cycle as _cyc
    from hpcclassmultigridproject_tpu.mg.cycle import _pallas_eligible

    sharded = shardings is not None and len(shardings[0].spec) > 0
    use_fused_open = (
        _FUSE_OPEN
        and _pallas_eligible(cfg, fine, sharded)
        and getattr(fine, "cn_from_v", False)
    )
    # whole-step opening: the flagship arrangement unrolls the top level of
    # its single V-cycle here so the pre-smooth fuses into the opening
    # kernel (everything below the top level is untouched — the coarse
    # tower/recursion runs exactly as mg_cycle would run it at lvl=1)
    use_open_smooth = (
        _FUSE_OPEN_SMOOTH
        and use_fused_open
        and shardings is None
        and cfg.num_cycles == 1
        and cfg.cycle_shape == 1
        and cfg.restriction == "inject"
        and cfg.smoother == "rbgs"
        and len(levels) > 1
    )
    open_res_dec = use_open_smooth and _cyc._RESTRICT_DEC

    def open_step(hi, lo, d_pend):
        """Fold the pending correction into the state pair and compute the
        next step's delta rhs — one fused banded HBM pass when eligible
        (ops/pallas/delta_step.py), else the separate jnp passes."""
        if use_fused_open:
            from hpcclassmultigridproject_tpu.ops.pallas.delta_step import (
                fused_accumulate_open,
            )

            return fused_accumulate_open(fine, hi, lo, d_pend)
        hi2, lo2 = _accumulate(hi, lo, d_pend, acc_dtype)
        return hi2, lo2, delta_rhs(fine, hi2, lo2)

    def _certify_hi(hi2, lo2, d):
        """The step's TRUE relative residual, entirely in the high dtype,
        via the exact delta identity: the reference's mg_outer ratio
        (multigrid.cpp:104-113) is ||rhs − A·u^{n+1}|| / ||rhs − A·u^n||
        with rhs = B·u^n, and algebraically

            rhs − A·u^n     = (B−A)·u^n           (the delta rhs)
            rhs − A·u^{n+1} = (B−A)·u^n − A·δ

        so the certificate needs TWO high-dtype stencils (difference-form
        (B−A)·u^n and A·δ) instead of the three of the
        reconstruct-B-then-two-residuals route — measured 6.2 → 3.3 ms
        per flagship run at certify_every=10 (RESULTS.md round 4).  The
        epilogue keeps the independent three-stencil form, so the two
        derivations cross-check each other at the final step."""
        u_prev = hi2.astype(acc_dtype) + lo2.astype(acc_dtype)
        rhs_d_hi = delta_rhs(fine_hi, u_prev)
        res_hi = rhs_d_hi - (
            fine_hi.diag_a * d.astype(acc_dtype)
            + neighbor_sum_auto(fine_hi, d.astype(acc_dtype))
        )
        rel = interior_norm(res_hi) / jnp.maximum(
            interior_norm(rhs_d_hi), jnp.finfo(rhs_d_hi.dtype).tiny
        )
        return rel.astype(jnp.float32)

    def step_plain(carry, _):
        # carry invariant: u_t = hi + lo + d_pend (the correction computed
        # by the previous iteration is folded in here, fused with the
        # opening so the state pair crosses HBM once per step)
        hi, lo, d_pend = carry
        hi2, lo2, rhs_d = open_step(hi, lo, d_pend)
        hi2, lo2, rhs_d = constrain(hi2), constrain(lo2), constrain(rhs_d)
        res0 = jnp.maximum(interior_norm(rhs_d), tiny)
        d = jnp.zeros_like(rhs_d)
        for k in range(cfg.num_cycles):
            # the last cycle's post-smooth also emits the certificate
            # residual (fused second output of the Pallas kernel — no
            # separate full stencil pass); the first cycle's pre-smooth
            # skips reading the zero iterate
            if k == cfg.num_cycles - 1:
                d, r = mg_cycle(levels, d, rhs_d, cfg, shardings=shardings,
                                want_final_residual=True, u_is_zero=k == 0)
            else:
                d = mg_cycle(levels, d, rhs_d, cfg, shardings=shardings,
                             u_is_zero=k == 0)
        rel = interior_norm(r) / res0
        return (hi2, lo2, constrain(d)), (
            rel.astype(jnp.float32), rel <= cfg.tol,
        )

    def step_open_smooth(carry, _):
        # whole-step opening (_FUSE_OPEN_SMOOTH): ONE kernel performs the
        # accumulate, the delta rhs AND the top-level pre-smooth (+
        # decimated residual); the rest of this body is exactly mg_cycle's
        # top level (lvl=0, shape=1) unrolled — the recursion below runs
        # unchanged at lvl=1 (same tower routing as the plain path).
        # Equality with step_plain is pinned by tests/test_pallas.py.
        from hpcclassmultigridproject_tpu.ops.padded import (
            prolong_bilinear,
            restrict_inject,
            restrict_inject_rows_decimated,
        )
        from hpcclassmultigridproject_tpu.ops.pallas.delta_step import (
            fused_open_presmooth,
        )

        hi, lo, d_pend = carry
        hi2, lo2, rhs_d, u1, r0 = fused_open_presmooth(
            fine, hi, lo, d_pend, cfg.niter,
            residual_rows_decimated=open_res_dec,
        )
        res0 = jnp.maximum(interior_norm(rhs_d), tiny)
        if open_res_dec:
            rhs_c = restrict_inject_rows_decimated(r0, levels[1].padded)
        else:
            rhs_c = restrict_inject(r0, levels[1].padded)
        u_c = mg_cycle(levels, jnp.zeros_like(rhs_c), rhs_c, cfg, lvl=1,
                       u_is_zero=True)
        corr = prolong_bilinear(u_c, fine.padded)
        d, r = _cyc._smooth_block(cfg, fine, u1, rhs_d, cfg.niter, True,
                                  corr=corr)
        rel = interior_norm(r) / res0
        return (hi2, lo2, d), (rel.astype(jnp.float32), rel <= cfg.tol)

    step = step_open_smooth if use_open_smooth else step_plain

    init = (hi0, lo0, jnp.zeros_like(hi0))
    seg = cfg.certify_every
    if seg and num_steps >= seg:
        # rigorous per-k-step certification (VERDICT r2 #6 / r3 #5) as a
        # SEGMENTED scan: `num_steps//seg` outer iterations of a seg-step
        # inner scan, with the high-dtype certificate computed BETWEEN
        # segments (steps seg-1, 2seg-1, ... — the same cadence a
        # `t % seg == seg-1` cond would fire on), then a plain scan over
        # the remainder steps.  A lax.cond inside the hot body costs
        # ~3.5 ms/run at N=1024 even when never taken (the branch bloats
        # the loop body and defeats fusion — measured round 4);
        # between-segment placement makes the certificates cost only their
        # own ~2 stencils each.  The segment-end carry is
        # (hi, lo, d_pend) = the last step's pre-accumulation state + its
        # correction — exactly the state _certify_hi certifies.
        nseg = num_steps // seg
        rem = num_steps - nseg * seg

        def seg_body(carry, _):
            carry, ys = jax.lax.scan(step, carry, None, length=seg)
            hi, lo, d_pend = carry
            return carry, (ys, _certify_hi(hi, lo, d_pend))

        # UNROLL the segment loop in chunks of 16: wrapping EVERY segment in
        # an outer lax.scan measured +5 ms/run at N=1024 on top of the
        # certificates' own cost (nested-scan overhead per segment);
        # unrolled, each certificate costs only its ~2 stencils (~0.37 ms).
        # Chunking (VERDICT r4 weak #6) keeps that flat at ANY step count:
        # high segment counts pay the nested-scan entry once per 16
        # segments (~0.3 ms amortized) instead of once per segment, and
        # trace size stays bounded by the 16-segment body.
        chunk = 16

        def run_segments(carry, count):
            parts = []
            for _ in range(count):
                carry, ys = seg_body(carry, None)
                parts.append(ys)
            return carry, parts

        if nseg <= chunk:
            carry, parts = run_segments(init, nseg)
        else:
            n_chunks, rem_seg = divmod(nseg, chunk)

            def chunk_body(carry, _):
                carry, parts = run_segments(carry, chunk)
                return carry, (
                    jnp.concatenate([p[0][0] for p in parts]),
                    jnp.concatenate([p[0][1] for p in parts]),
                    jnp.stack([p[1] for p in parts]),
                )

            carry, (rels_c, conv_c, hi_c) = jax.lax.scan(
                chunk_body, init, None, length=n_chunks
            )
            parts = [((rels_c.reshape(-1), conv_c.reshape(-1)),
                      hi_c.reshape(-1))]
            carry, tail = run_segments(carry, rem_seg)
            parts.extend(tail)
        rels = jnp.concatenate([p[0][0] for p in parts])
        conv = jnp.concatenate([p[0][1] for p in parts])
        rels_hi_seg = jnp.concatenate(
            [jnp.atleast_1d(p[1]) for p in parts]
        )
        if rem:
            carry, (rels_r, conv_r) = jax.lax.scan(
                step, carry, None, length=rem
            )
            rels = jnp.concatenate([rels, rels_r])
            conv = jnp.concatenate([conv, conv_r])
        hi_p, lo_p, d_last = carry
        rels_hi = jnp.full((num_steps,), -1.0, jnp.float32)
        rels_hi = rels_hi.at[
            jnp.arange(nseg, dtype=jnp.int32) * seg + (seg - 1)
        ].set(rels_hi_seg)
    else:
        (hi_p, lo_p, d_last), (rels, conv) = jax.lax.scan(
            step, init, None, length=num_steps
        )
        rels_hi = jnp.full((num_steps,), -1.0, jnp.float32)

    # epilogue: the final pending correction folds in high precision, and
    # the last step's residual is recomputed entirely in the high dtype —
    # the rigorous certificate (hi_p + lo_p = u^{T-1} by the carry invariant)
    u_prev = hi_p.astype(acc_dtype) + lo_p.astype(acc_dtype)
    uT = u_prev + d_last.astype(acc_dtype)
    rhs_hi = fine_hi.diag_b * u_prev - neighbor_sum_auto(fine_hi, u_prev)
    r_hi = residual_auto(fine_hi, uT, rhs_hi)
    res0_hi = interior_norm(residual_auto(fine_hi, u_prev, rhs_hi))
    rel_hi = interior_norm(r_hi) / jnp.maximum(
        res0_hi, jnp.finfo(res0_hi.dtype).tiny
    )

    stats = {
        "cycles": jnp.full((num_steps,), cfg.num_cycles, jnp.int32),
        "rel_residual": rels,
        "converged": conv,
        "final_rel_residual_hi": rel_hi.astype(jnp.float32),
    }
    if cfg.certify_every:
        # per-step rigorous certificates; -1 marks uncertified steps
        stats["rel_residual_hi_steps"] = rels_hi
        checked = rels_hi >= 0
        stats["certified"] = jnp.where(checked, rels_hi <= cfg.tol, True)
    return uT, stats
