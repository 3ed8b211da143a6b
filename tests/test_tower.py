"""Coarse-tower megakernel (ops/pallas/tower.py) vs the unfused cycle —
interpret mode on CPU.

The megakernel's contract is BIT-exactness against the plain recursion in
interpret mode: every in-kernel primitive (cascade, reshape row-decimation,
HIGHEST-precision transfer matmuls, interleave prolongation) mirrors its
ops/padded.py / smoother.py counterpart's operation sequence exactly
(verified on hardware too: the n=512 flagship run is bit-identical,
RESULTS.md round 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpcclassmultigridproject_tpu.mg.cycle as cyc
import hpcclassmultigridproject_tpu.ops.pallas.smoother as psm
import hpcclassmultigridproject_tpu.ops.pallas.tower as twr
from hpcclassmultigridproject_tpu import ProblemConfig, SolverConfig
from hpcclassmultigridproject_tpu.models import AdvectionDiffusion


@pytest.fixture(autouse=True)
def _interpret():
    old_i, old_t = psm.INTERPRET, cyc._USE_TOWER
    psm.INTERPRET = True
    yield
    psm.INTERPRET = old_i
    cyc._USE_TOWER = old_t


def _cfg(**kw):
    base = dict(dtype=jnp.float32, refine_dtype=jnp.float64, tol=1e-6,
                cycle_mode="fixed", num_cycles=1, coarse_mode="dense",
                delta_form=True, backend="pallas")
    base.update(kw)
    return SolverConfig(**base)


@pytest.mark.slow
def test_tower_flagship_matches_plain():
    """Full delta-form run: tower on == tower off within the few-ulp
    cross-program contract (observed bit-identical both here and on the
    chip at n=512/1024 — RESULTS.md round 4 — but the contract is ulps,
    not bits: the two schedules are different XLA programs)."""
    p = ProblemConfig(n=256, num_steps=3)
    cyc._USE_TOWER = False
    uT0, st0 = AdvectionDiffusion(p, _cfg(num_levels=4)).run(warn=False)
    cyc._USE_TOWER = True
    uT1, st1 = AdvectionDiffusion(p, _cfg(num_levels=4)).run(warn=False)
    np.testing.assert_allclose(
        np.asarray(uT0), np.asarray(uT1), rtol=1e-5, atol=1e-12
    )
    f0 = float(st0["final_rel_residual_hi"])
    f1 = float(st1["final_rel_residual_hi"])
    assert f1 <= 1e-6 and abs(f1 - f0) <= 0.2 * max(f0, f1)


def test_tower_cycle_matches_plain_direct():
    """tower_vcycle == mg_cycle(zero iterate) at the entry level, within
    the few-ulp cross-program contract (the megakernel and the per-level
    recursion are different XLA programs; the compiler's fma association
    may differ between them — the same deliberate tolerance as
    test_pallas.py::test_fused_multiband_banding_is_exact.  A transfer or
    masking bug would show errors of order the field scale, ~1e-2)."""
    p = ProblemConfig(n=128, num_steps=1)
    cfg = _cfg(num_levels=3)
    model = AdvectionDiffusion(p, cfg)
    rng = np.random.default_rng(7)
    rhs = np.zeros(model.levels[1].padded, np.float32)
    n1 = model.levels[1].n
    rhs[1:n1, 1:n1] = rng.standard_normal((n1 - 1, n1 - 1))
    rhs = jnp.asarray(rhs)
    cyc._USE_TOWER = False
    want = cyc.mg_cycle(model.levels, jnp.zeros_like(rhs), rhs, cfg, lvl=1,
                        u_is_zero=True)
    got = twr.tower_vcycle(model.levels, 1, rhs, cfg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=5e-7
    )


def test_tower_ineligible_paths():
    """Eligibility guards: W-cycles, GS coarse, full-weighting, f64, and
    sharded levels must all refuse the megakernel."""
    p = ProblemConfig(n=128, num_steps=1)
    model = AdvectionDiffusion(p, _cfg(num_levels=3))
    levels = model.levels

    ok = _cfg(num_levels=3)
    assert cyc._tower_eligible(ok, levels, 1, None, True)
    assert not cyc._tower_eligible(ok, levels, 0, None, True)
    assert not cyc._tower_eligible(ok, levels, 1, None, False)
    assert not cyc._tower_eligible(
        _cfg(num_levels=3, cycle_shape=2), levels, 1, None, True)
    assert not cyc._tower_eligible(
        _cfg(num_levels=3, restriction="full"), levels, 1, None, True)
    # GS coarse mode (no dense inverse contract)
    gs = SolverConfig(dtype=jnp.float32, refine_dtype=jnp.float64,
                      cycle_mode="fixed", num_cycles=1, coarse_mode="gs",
                      delta_form=True, backend="pallas", num_levels=3)
    assert not cyc._tower_eligible(gs, levels, 1, None, True)
    # f64 cycle dtype
    f64 = SolverConfig(dtype=jnp.float64, cycle_mode="fixed", num_cycles=1,
                       coarse_mode="dense", backend="pallas", num_levels=3)
    assert not cyc._tower_eligible(f64, levels, 1, None, True)
    # sharded levels bar the tower
    from hpcclassmultigridproject_tpu.parallel import make_mesh
    from hpcclassmultigridproject_tpu.parallel.sharding import level_shardings

    sh = level_shardings(levels, make_mesh(), min_local=8)
    if any(len(s.spec) > 0 for s in sh[1:]):
        assert not cyc._tower_eligible(ok, levels, 1, sh, True)


def test_tower_vmem_guard():
    """A tower whose resident set exceeds the scoped-VMEM cap must fail at
    trace time with a readable error, not fault the chip."""
    import jax as _jax

    arrays = [_jax.ShapeDtypeStruct((8192, 8192), jnp.float32)]
    with pytest.raises(ValueError, match="scoped-VMEM cap"):
        twr._tower_compiler_params(arrays, arrays, 4)


def test_transfer_matrices_match_padded_ops():
    """The tower's column-transfer matrices reproduce ops/padded.py's
    decimation/prolongation exactly (f64, outside any kernel)."""
    from hpcclassmultigridproject_tpu.ops.padded import (
        prolong_bilinear,
        restrict_inject,
    )

    rng = np.random.default_rng(3)
    fine_shape, coarse_shape = (72, 128), (40, 128)
    x = jnp.asarray(rng.standard_normal(fine_shape))
    want = restrict_inject(x, coarse_shape)
    D = jnp.asarray(twr._col_decimate_matrix(fine_shape[1], coarse_shape[1]),
                    x.dtype)
    half = np.asarray(x)[::2][: coarse_shape[0]]
    half = np.pad(half, ((0, coarse_shape[0] - half.shape[0]), (0, 0)))
    got = jnp.asarray(half) @ D
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    c = np.zeros(coarse_shape)
    c[1:32, 1:32] = rng.standard_normal((31, 31))
    c = jnp.asarray(c)
    want_p = prolong_bilinear(c, fine_shape)
    P = jnp.asarray(twr._col_prolong_matrix(coarse_shape[1], fine_shape[1]),
                    c.dtype)
    cn = np.asarray(c)
    rows_odd = 0.5 * (cn + np.vstack([cn[1:], np.zeros((1, cn.shape[1]))]))
    inter = np.stack([cn, rows_odd], 1).reshape(2 * cn.shape[0], cn.shape[1])
    inter = inter[: fine_shape[0]]
    got_p = jnp.asarray(inter) @ P
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))
