"""Fused red–black Gauss–Seidel Pallas kernel.

The jnp smoother (ops/padded.py) costs one full HBM round-trip of
(u, rhs, aa, bb, cc, dd) per COLOR PASS — 14 array-traffics per sweep, 42 for
the reference's 3-sweep pre/post smooth (multigrid.cpp:41).  This kernel fuses
all `nsweeps` sweeps (both colors) and optionally the trailing residual into
ONE pass over HBM: every array is read once per band, the sweeps run entirely
in VMEM, and u (+res) is written once — ~6x less memory traffic for the
dominant cost of the V-cycle.

Exact reference semantics (the gs.cu:389-391 kernel-launch barrier between
colors) are preserved across band boundaries by halo recomputation (temporal
blocking): each band loads an H-row halo on each side (overlapping
`pl.Element` windows) and recomputes the sweep cascade over a validity region
that shrinks by one row per color pass, so the final center rows carry
exactly the values a global barrier schedule would produce.  "Exactly" means
schedule-exact: every output element is produced by the same operation
sequence on the same operand values as the single-band program.  Bit-level
results may still drift by a few ulps between band GEOMETRIES, because two
geometries are two different XLA programs and the compiler is free to fuse
a*b+c into fma differently in each (tests/test_pallas.py::
test_fused_multiband_banding_is_exact pins this contract).
H = ceil((2·nsweeps+1)/8)·8 covers the dependency radius of the cascade plus
the trailing residual and keeps (8,128) f32 tile alignment.

Mosaic does not support low Element padding, so the first band's window is
clamped to start at row 0; the validity shrink is exempted at true array
edges (correct because everything outside the open interior has zero
coefficients — the padded-layout invariant, core/layout.py).  Window rows
past the end of the array are zeroed in-kernel by a global-row mask so
uninitialized padding (potentially NaN) cannot leak through 0·NaN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flip for CPU-based testing of the kernel (tests/test_pallas.py).
INTERPRET = False

# Input-window working-set target; the true footprint is ~(2x double-
# buffered windows + kernel temporaries + 2x outputs) and is checked against
# _VMEM_LIMIT by _assert_vmem_fit at trace time.  History: round 2 swept
# 3→4→6 MB on-chip (6 MB intermittently exceeded the 16 MB Mosaic cap),
# then ended by blind-raising to 32 MB + a 100 MB vmem_limit_bytes override,
# which FAULTED THE CHIP (BENCH_r02 rc=1) — at limits near the 128 MiB
# physical VMEM the compile-time check passes but the hardware faults.
# Round 3 probed the (budget, limit) plane per-config-per-process on the
# v5e at n=4096 (scripts/band_probe_tpu.py → bench_data/band_probe.jsonl):
#   4/16 MB bh=24: 44.0 GDOF/s     12/48 MB bh=104: 75.1 GDOF/s  <- winner
#   8/32 MB bh=64: 53.0 GDOF/s     15/56 MB bh=136: 57.3 GDOF/s
#                                  16/64 MB bh=144: 56.9 GDOF/s
# (non-monotone: past ~104 rows the deeper scoped allocation costs more
# than the halo-recompute saving).  Every config whose calibrated footprint
# exceeded its limit failed CLEANLY at AOT compile ("Ran out of memory in
# memory space vmem ... on stack").
#
# BUT deep bands only pay off on WIDE rows: at n=2048 the same 12/48 config
# (bh=224) measured 55 GDOF/s vs the proven 4 MB config's 81.7 (bh=40), and
# the FULL delta program faulted the worker at runtime with it (each kernel
# compiled clean in isolation — the fault is whole-program VMEM pressure
# from several deep-window kernels, reproduced + bisected to the deep-band
# geometry, /tmp fault hunt → RESULTS.md round 3).  Policy, all measured:
# narrow rows (< _WIDE_ROW_BYTES) keep the round-2-proven 4 MB budget and
# Mosaic's default 16 MiB cap; wide rows (n≥4096) get the probed 12 MB
# winner under a 48 MB cap.  Changing any of these still requires
# scripts/smoke_tpu.py on hardware.
_VMEM_BUDGET = 12 * 1024 * 1024
_NARROW_BUDGET = 4 * 1024 * 1024
_XWIDE_BUDGET = 16 * 1024 * 1024
_WIDE_ROW_BYTES = 16000   # cols*itemsize at n=4096 is 16896; n=2048 is 8704
_XWIDE_ROW_BYTES = 32000  # n=8192 is 33280

# Scoped-VMEM cap the working-set assertion checks against.  An explicit
# vmem_limit_bytes is emitted per kernel ONLY when that kernel's modeled
# footprint exceeds Mosaic's builtin 16 MiB default; narrow-row kernels
# stay under the builtin cap and carry no override.  The xwide (n>=8192)
# tier uses the 64 MiB cap — the largest at which over-size geometries
# still fail CLEANLY at AOT compile (round-3 finding; re-confirmed round 4
# by the rejected bh=80 probe at n=8192).  Round-4 probe at n=8192
# (bench_data/band_probe.jsonl): bh=40 41.0, bh=64 47.2, bh=72 46.8 GDOF/s.
_VMEM_LIMIT = 48 * 1024 * 1024
_XWIDE_LIMIT = 64 * 1024 * 1024
_DEFAULT_VMEM_LIMIT = 16 * 1024 * 1024


def _budget_for(row_bytes: int) -> int:
    if row_bytes >= _XWIDE_ROW_BYTES:
        return max(_VMEM_BUDGET, _XWIDE_BUDGET)
    if row_bytes >= _WIDE_ROW_BYTES:
        return _VMEM_BUDGET
    return min(_VMEM_BUDGET, _NARROW_BUDGET)


def _limit_for(row_bytes: int) -> int:
    """Scoped-VMEM cap the geometry must fit: narrow-row kernels carry no
    vmem_limit_bytes override (ADVICE r3 #1 — capping them against the raised
    _VMEM_LIMIT would silently re-enable the override and re-open the
    whole-program VMEM pressure class), so their band is capped against the
    no-override default budget."""
    if row_bytes >= _XWIDE_ROW_BYTES:
        return max(_VMEM_LIMIT, _XWIDE_LIMIT)
    if row_bytes >= _WIDE_ROW_BYTES:
        return _VMEM_LIMIT
    return min(_VMEM_LIMIT, _DEFAULT_VMEM_LIMIT)


def _compiler_params(footprint: int | None = None, row_bytes: int = 0):
    limit = _limit_for(row_bytes) if row_bytes else _VMEM_LIMIT
    if footprint is not None and footprint <= _DEFAULT_VMEM_LIMIT:
        return None
    if limit == _DEFAULT_VMEM_LIMIT:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=limit)

# Empirical allowance for Mosaic kernel temporaries, in input-window units.
# Calibrated against the AOT compiler's own scoped-allocation reports (the
# sweep cascade's live intermediates: u, upd, masks, the four recomputed
# coefficient planes and the nb() accumulator):
#   round 3, n=4096 from_v: actual stack 41.39 M @ bh=104 -> T = 9.93
#   round 4, n=8192 from_v: actual stack 65.81 M @ bh=80  -> T = 10.27
# (the round-3 note rounded to 9, which under-modeled by ~4 MiB at 33 KB
# rows and let a 64 MiB-limit config through to a clean AOT rejection).
# 10.5 upper-bounds both measured points.
_TEMP_WINDOWS = 10.5
# The nine-band (Galerkin) kernel keeps more live planes (4 corner-band
# windows' products, the varying diagonal and its reciprocal): measured
# 20.3 windows from the AOT report at n=256 (actual stack 16.75 M,
# n_in=11, bh=232); 21 upper-bounds it.
_TEMP_WINDOWS_NINE = 21.0


def _halo(nsweeps: int) -> int:
    """Halo rows per side: dependency radius 2·nsweeps (+1 for the residual),
    rounded up to the 8-row f32 sublane tile."""
    return -(-(2 * nsweeps + 1) // 8) * 8


def _footprint(bh: int, cols: int, itemsize: int, h: int,
               n_in: int, n_out: int, temps: float | None = None) -> int:
    """Calibrated working-set model: 2x double-buffered input windows of
    (bh+2h) rows, 2x double-buffered output bands, plus the temporary
    allowance (see _TEMP_WINDOWS calibration note; the nine-band kernel
    carries its own larger allowance)."""
    if temps is None:
        temps = _TEMP_WINDOWS
    win = (bh + 2 * h) * cols * itemsize
    band = bh * cols * itemsize
    return int(2 * n_in * win + 2 * n_out * band + temps * win)


def _assert_vmem_fit(bh: int, cols: int, itemsize: int, h: int,
                     n_in: int, n_out: int,
                     temps: float | None = None) -> int:
    """Trace-time guard (VERDICT r2 #1): the modeled working set must fit
    the scoped-VMEM cap.  A bad _VMEM_BUDGET now fails here with a readable
    error instead of faulting the TPU worker at run time.  Returns the
    modeled footprint (used to decide whether a vmem_limit_bytes override
    is emitted at all)."""
    footprint = _footprint(bh, cols, itemsize, h, n_in, n_out, temps)
    limit = _limit_for(cols * itemsize)
    if footprint > limit:
        raise ValueError(
            f"fused-smoother band working set {footprint / 2**20:.1f} MiB "
            f"(bh={bh}, cols={cols}, {n_in} in / {n_out} out windows, "
            f"+{temps or _TEMP_WINDOWS} temporaries) exceeds the "
            f"{limit / 2**20:.0f}"
            " MiB scoped-VMEM cap; lower _VMEM_BUDGET (or validate a raised "
            "cap on hardware with scripts/smoke_tpu.py first)"
        )
    return footprint


def _pick_band(rows: int, cols: int, itemsize: int, h: int,
               n_windows: int = 6, n_in: int | None = None,
               n_out: int | None = None,
               temps: float | None = None,
               budget: int | None = None) -> int:
    """Largest multiple-of-8 band height whose `n_windows` input-window rows
    fit the VMEM budget.  The fixed window-count proxy (6 for the smoother,
    8 for the delta opening) is the on-chip-proven geometry heuristic; when
    the caller supplies its true (n_in, n_out), the band is additionally
    capped so the CALIBRATED footprint model (_assert_vmem_fit's
    2·n_in·win + 2·n_out·band + _TEMP_WINDOWS·win) fits _VMEM_LIMIT — so a
    raised budget can never produce a geometry the compiler would reject."""
    per_row = n_windows * cols * itemsize
    if budget is None:
        budget = _budget_for(cols * itemsize)
    bh = (budget // per_row - 2 * h) // 8 * 8
    bh = max(8, min(bh, -(-rows // 8) * 8))
    if n_in is not None and n_out is not None:
        # solve 2·n_in·(bh+2h)·c·e + 2·n_out·bh·c·e + T·(bh+2h)·c·e <= LIMIT
        # (the row-width-dependent limit: narrow rows are capped against the
        # no-override default so they never earn a vmem_limit_bytes override)
        t = _TEMP_WINDOWS if temps is None else temps
        ce = cols * itemsize
        row_coef = 2 * n_in + 2 * n_out + t
        const = 2 * h * (2 * n_in + t)
        cap = int((_limit_for(ce) // ce - const) // row_coef) // 8 * 8
        bh = max(8, min(bh, cap))
    return bh


def _kernel(nsweeps, bh, h, total_rows, diag_a, want_residual, cn, zero_init,
            add_corr, with_row_off, nine, res_rows_dec, *refs):
    # refs: with cn=None, (u, rhs, aa, bb, cc, dd) windows of shape
    # (bh+2h, cols); with cn=(rr, half_h, nu, n), (u, rhs, v1, v2) windows
    # and the CN coefficients are recomputed in-kernel (the reference's own
    # per-point strategy, gs.cpp:126-129 — on TPU it trades 2 HBM array
    # reads for a handful of free VPU flops).  With zero_init, the u window
    # is absent entirely (the sweep cascade starts from u = 0 — the coarse-
    # level correction solves and the delta opening all start from zero, so
    # skipping the read saves materializing + loading a zeros array).  With
    # add_corr, a `corr` window follows u and the iterate is u + corr — the
    # prolonged coarse correction folds into the post-smooth read instead of
    # costing its own add pass over HBM (SURVEY §7.3c).  With nine
    # (Galerkin RAP levels, sparse/galerkin.py), four corner-band windows
    # (ne, nw, se, sw) and the spatially-varying diagonal follow the four
    # edge bands; the dependency radius per color pass is still 1, so the
    # banding/halo machinery is untouched (VERDICT r3 weak #7).
    # Then outputs.
    i = pl.program_id(0)
    first = i == 0
    last = i == pl.num_programs(0) - 1
    rows = bh + 2 * h
    cols = refs[0].shape[1]
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    # int constants pinned to i32: under jax_enable_x64 a weak Python int
    # stages as i64 and Mosaic's i64→i32 convert rule recurses forever
    start = jnp.maximum(i * jnp.int32(bh) - jnp.int32(h), jnp.int32(0))
    g = start + r_idx
    exists = g < jnp.int32(total_rows)   # rows past the end -> zero (kills NaN)

    # NB: every constant below is pinned to the ref dtype — under
    # jax_enable_x64 a bare Python 0.0/0 becomes a weak f64/i64 that Mosaic
    # cannot lower (f64 convert recursion), so zeros are dtype-exact.
    dtype = refs[0].dtype
    zero = dtype.type(0)
    n_in = (((11 if nine else 6) if cn is None else 4)
            - (1 if zero_init else 0) + (1 if add_corr else 0))
    # with_row_off (sharded use, parallel/pallas_halo.py): one trailing SMEM
    # scalar holds the block's global row offset so the from_v interior mask
    # works on a device-local extended block (local row + off = global row)
    n_args = n_in + (1 if with_row_off else 0)
    fields = [jnp.where(exists, r[:], zero) for r in refs[:n_in]]
    if zero_init:
        fields = [jnp.zeros_like(fields[0])] + fields
    if add_corr:
        fields[0] = fields[0] + fields[1]
        del fields[1]
    if nine:
        u, rhs, aa, bb, cc, dd, ne, nw, se, sw, dg = fields
        # the varying diagonal is stored with ONES outside the interior
        # (mg/levels.py) so reciprocals stay finite; the exists NaN-guard
        # zeroed the overhang rows — restore 1 there or 0/0 poisons the
        # cascade through the corner reads
        dg = jnp.where(exists, dg, dtype.type(1))
    elif cn is None:
        u, rhs, aa, bb, cc, dd = fields
    else:
        u, rhs, v1, v2 = fields
        rr_c, hh_c, nu_c, n_c = cn
        rr = dtype.type(rr_c)
        hh = dtype.type(hh_c)
        nu = dtype.type(nu_c)
        # open-interior mask in GLOBAL indices (core/layout.py invariant:
        # coefficients are zero outside [1:n, 1:n]); expression shape mirrors
        # mg/levels.py::_np_cn_coefficients for f64 bit-parity in tests
        one_i = jnp.int32(1)
        nm1 = jnp.int32(n_c - 1)
        g_mask = g + refs[n_in][0, 0] if with_row_off else g
        interior = ((g_mask >= one_i) & (g_mask <= nm1)
                    & (c_idx >= one_i) & (c_idx <= nm1))
        mask = jnp.where(interior, dtype.type(1), zero)
        aa = rr * (-v2 * hh + nu) * mask
        bb = rr * (v2 * hh + nu) * mask
        cc = rr * (-v1 * hh + nu) * mask
        dd = rr * (v1 * hh + nu) * mask

    def nb(x):
        up = jnp.pad(x[:-1, :], ((1, 0), (0, 0)), constant_values=zero)
        dn = jnp.pad(x[1:, :], ((0, 1), (0, 0)), constant_values=zero)
        lf = jnp.pad(x[:, :-1], ((0, 0), (1, 0)), constant_values=zero)
        rt = jnp.pad(x[:, 1:], ((0, 0), (0, 1)), constant_values=zero)
        s = cc * up + dd * dn + aa * lf + bb * rt
        if nine:
            # corner couplings (ops/padded.py::neighbor_sum order):
            # ne -> x[i-1,j+1], nw -> x[i-1,j-1], se -> x[i+1,j+1],
            # sw -> x[i+1,j-1].  Each corner shift is a SINGLE-axis pad of
            # the already-shifted row plane — Mosaic cannot lower
            # two-axis pads ("result/input offset mismatch on non-concat
            # dimension", caught on hardware round 4); the composition is
            # value-identical (zero-fill composes exactly)
            ur = jnp.pad(up[:, 1:], ((0, 0), (0, 1)), constant_values=zero)
            ul = jnp.pad(up[:, :-1], ((0, 0), (1, 0)), constant_values=zero)
            dr = jnp.pad(dn[:, 1:], ((0, 0), (0, 1)), constant_values=zero)
            dl = jnp.pad(dn[:, :-1], ((0, 0), (1, 0)), constant_values=zero)
            s = s + ne * ur + nw * ul + se * dr + sw * dl
        return s

    # red = (i+j) even in GLOBAL indices; g parity == r_idx parity since the
    # window start is a multiple of 8
    red = ((r_idx + c_idx) & jnp.int32(1)) == jnp.int32(0)
    diag = dg if nine else dtype.type(diag_a)
    inv_diag = dtype.type(1) / diag if nine else dtype.type(1.0 / diag_a)

    for p in range(2 * nsweeps):
        color = red if p % 2 == 0 else jnp.logical_not(red)
        # validity shrinks by one row per pass, except at true array edges
        # (the first band's window starts at row 0, the last band's window
        # covers the array end) where the stencil's zero-fill IS the truth
        valid = ((r_idx >= jnp.int32(p + 1)) | first) & (
            (r_idx < jnp.int32(rows - (p + 1))) | last)
        upd = (rhs - nb(u)) * inv_diag
        u = jnp.where(color & valid, upd, u)

    # center offset inside the window: 0 for the first band (clamped window),
    # h otherwise — two static slices under pl.when (Mosaic has no value
    # dynamic_slice)
    res = rhs - diag * u - nb(u) if want_residual else None

    def _dec(x):
        # row-decimated center band (restriction rows, gs.cpp:283): band
        # starts are even (bh multiple of 8), so center row 2j is global
        # row start+2j — rank-3 reshape decimation (sublane-stride slices
        # do not lower in Mosaic; probed, scripts/mosaic_probe_tpu.py)
        return x.reshape(bh // 2, 2, cols)[:, 0, :]

    @pl.when(first)
    def _():
        refs[n_args][:] = u[0:bh, :]
        if want_residual:
            r_c = res[0:bh, :]
            refs[n_args + 1][:] = _dec(r_c) if res_rows_dec else r_c

    @pl.when(jnp.logical_not(first))
    def _():
        refs[n_args][:] = u[h:h + bh, :]
        if want_residual:
            r_c = res[h:h + bh, :]
            refs[n_args + 1][:] = _dec(r_c) if res_rows_dec else r_c


@functools.partial(
    jax.jit,
    static_argnames=(
        "nsweeps", "diag_a", "want_residual", "cn", "zero_init", "add_corr",
        "with_row_off", "nine", "res_rows_dec",
    ),
)
def _fused(*arrays, nsweeps, diag_a, want_residual, cn=None, zero_init=False,
           add_corr=False, with_row_off=False, nine=False,
           res_rows_dec=False):
    # arrays: (u, [corr,] rhs, fields...) — or (rhs, fields...) with
    # zero_init — where fields = (aa, bb, cc, dd) precomputed, (v1, v2)
    # with cn set, or (aa..dd, ne, nw, se, sw, diag) with nine (Galerkin).
    # With with_row_off, one trailing (1, 1) i32 array holds
    # the block's global row offset (sharded use, parallel/pallas_halo.py).
    rows, cols = arrays[0].shape
    h = _halo(nsweeps)
    n_win = len(arrays) - (1 if with_row_off else 0)
    n_out = 2 if want_residual else 1
    temps = _TEMP_WINDOWS_NINE if nine else None
    bh = _pick_band(rows, cols, arrays[0].dtype.itemsize, h,
                    n_windows=max(6, n_win),
                    n_in=n_win, n_out=n_out, temps=temps)
    if res_rows_dec:
        # the decimated-residual output block is bh/2 rows and Mosaic needs
        # output blocks divisible by 8 -> bh must be a multiple of 16
        # (n=4096: 104 -> 96, ~1% extra halo recompute; other sizes already
        # are multiples of 16)
        assert want_residual, "res_rows_dec requires want_residual"
        if bh < 16:
            # the VMEM-capped band is thinner than the 16-row decimation
            # multiple (tiny probe budgets) — forcing 16 would double the
            # modeled working set past the cap (ADVICE r4 #3).  Degrade:
            # full-resolution residual in-kernel, row decimation outside
            # (sublane-dim stride-2 slice — cheap, and bit-identical to the
            # in-kernel _dec, which also takes rows 0,2,4,...).
            u_out, res = _fused(
                *arrays, nsweeps=nsweeps, diag_a=diag_a, want_residual=True,
                cn=cn, zero_init=zero_init, add_corr=add_corr,
                with_row_off=with_row_off, nine=nine, res_rows_dec=False,
            )
            return u_out, res[::2, :][: rows // 2]
        bh = bh // 16 * 16
    footprint = _assert_vmem_fit(bh, cols, arrays[0].dtype.itemsize, h,
                                 n_in=n_win, n_out=n_out, temps=temps)
    grid = pl.cdiv(rows, bh)

    # overlapping element-offset windows: rows [max(i*bh-h, 0), +bh+2h)
    # index-map returns pinned to i32: under jax_enable_x64 a bare Python 0
    # stages as i64 and Mosaic cannot legalize the (i32, i64) map signature
    in_spec = pl.BlockSpec(
        (pl.Element(bh + 2 * h, (0, bh + 2 * h)), pl.Element(cols, (0, 0))),
        lambda i: (
            pl.multiple_of(
                jnp.maximum(i * jnp.int32(bh) - jnp.int32(h), jnp.int32(0)), 8
            ),
            jnp.int32(0),
        ),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (bh, cols), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct(arrays[0].shape, arrays[0].dtype)
    if want_residual:
        if res_rows_dec:
            # row-decimated residual (restriction pre-fusion): each band
            # writes its bh/2 decimated center rows; only the column
            # matmul remains outside (ops/padded.py::_decimate cols)
            res_shape = jax.ShapeDtypeStruct((rows // 2, cols),
                                             arrays[0].dtype)
            res_spec = pl.BlockSpec(
                (bh // 2, cols), lambda i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            )
        else:
            res_shape = jax.ShapeDtypeStruct(arrays[0].shape,
                                             arrays[0].dtype)
            res_spec = out_spec
        out_shape = (out_shape, res_shape)
        out_spec = (out_spec, res_spec)

    in_specs = [in_spec] * n_win
    if with_row_off:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.SMEM)
        )
    return pl.pallas_call(
        functools.partial(
            _kernel, nsweeps, bh, h, rows, diag_a, want_residual, cn,
            zero_init, add_corr, with_row_off, nine, res_rows_dec,
        ),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=INTERPRET,
        compiler_params=_compiler_params(
            footprint, cols * arrays[0].dtype.itemsize
        ),
    )(*arrays)


def cn_params(level) -> tuple[float, float, float, int]:
    """Static (rr, half_h, nu, n) tuple for in-kernel CN coefficient
    recompute (gs.cpp:9-20: rr = dt/(2h²), half_h = h/2).  The SINGLE
    source for every from_v kernel call site — the tuple is a jit-cache key,
    so the single-device (fused_rb_sweeps), sharded (parallel/pallas_halo.py)
    and delta-opening (delta_step.py) paths must build it identically or a
    float drift silently desynchronizes them and forces recompiles
    (ADVICE r3 #4)."""
    return (
        0.5 * level.dt / (level.h * level.h),
        0.5 * level.h,
        level.nu,
        level.n,
    )


def fused_rb_sweeps(level, u, rhs, nsweeps: int, want_residual: bool = False,
                    zero_init: bool = False, corr=None,
                    residual_rows_decimated: bool = False):
    """`nsweeps` red–black GS sweeps (+ optional trailing residual) in one
    fused HBM pass.  Drop-in replacement for `nsweeps` calls of
    ops/padded.py::rb_gauss_seidel (+ one residual); see tests/test_pallas.py
    for the equivalence suite.

    CN levels built from velocity fields (level.cn_from_v) use the
    recomputed-coefficient kernel: the band windows read (u, rhs, v1, v2)
    instead of (u, rhs, aa, bb, cc, dd) — 25-30% less HBM traffic for the
    bandwidth-bound smoother, with the coefficient flops free on the VPU.

    `zero_init=True` declares u == 0 (correction solves, delta openings):
    the u window is dropped from the kernel inputs entirely, and `u` may be
    passed as None.

    `corr` (mutually exclusive with zero_init): smooth from the iterate
    u + corr — the prolonged coarse-grid correction is added in-kernel, so
    the separate add pass (read u + read corr + write sum + re-read by the
    smoother) collapses into the smoother's own window reads.

    `residual_rows_decimated=True`: the residual output is ROW-decimated
    (res[::2, :]) in-kernel — the row half of an injection restriction
    (gs.cpp:283), halving the residual write and the downstream restrict
    read; finish with ops/padded.py::restrict_inject_rows_decimated.

    Galerkin levels (level.ne/diag set) route through the nine-band kernel
    form automatically (corner couplings + spatially-varying diagonal)."""
    assert not (zero_init and corr is not None)
    nine = level.ne is not None or level.diag is not None
    if nine:
        # Galerkin RAP level (sparse/galerkin.py): 9-point bands + varying
        # diagonal.  RB semantics match ops/padded.py::rb_gauss_seidel
        # (corner neighbors share the node's color and are read at their
        # pre-sweep values — see the galerkin module docstring).
        assert level.ne is not None and level.diag is not None
        cn = None
        fields = (level.aa, level.bb, level.cc, level.dd,
                  level.ne, level.nw, level.se, level.sw, level.diag)
    elif getattr(level, "cn_from_v", False):
        cn = cn_params(level)
        fields = (level.v1, level.v2)
    else:
        cn = None
        fields = (level.aa, level.bb, level.cc, level.dd)
    if zero_init:
        arrays = (rhs, *fields)
    elif corr is not None:
        arrays = (u, corr, rhs, *fields)
    else:
        arrays = (u, rhs, *fields)
    out = _fused(
        *arrays, nsweeps=nsweeps, diag_a=level.diag_a,
        want_residual=want_residual, cn=cn, zero_init=zero_init,
        add_corr=corr is not None, nine=nine,
        res_rows_dec=residual_rows_decimated,
    )
    return out if want_residual else (out, None)
