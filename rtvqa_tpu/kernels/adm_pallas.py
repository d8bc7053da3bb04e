"""Pallas TPU kernel: fused ADM/DLM scale 0 (DWT + decouple + CSF + masking
+ L3 pooling partial sums).

ADM's scale 0 dominates program B's remaining HBM traffic (VERDICT r1 weak
#3): the XLA path materializes full-resolution row-filter intermediates plus
eight half-resolution subbands, the decoupled/additive bands, the 3x3 masking
threshold and the pooling powers — ~20 HBM-resident arrays per frame pair.
This kernel streams row strips of both lumas through VMEM and writes only:

* six partial pooling sums per strip (num/den per band, pre-cube-root);
* the approximation bands a_ref/a_dis (the next level's quarter-size
  inputs). The db2 taps are scale-invariant, so the same kernel runs ALL
  four DWT levels (only the Watson CSF weights and input size change);
  ``adm_features_pallas`` chains it level to level.

The kernel reads the RAW (unpadded) luma: every border effect — the db2
reflect halo on rows AND lanes, the subband-grid edge replication for the
masking spread, the block padding of chained inputs — is encoded in the
banded selection matrices and clamped DMA windows (round 3e). The previous
design pre-padded inputs with a chain of XLA ``jnp.pad`` ops; stage
bisection (scripts/probe_adm_stages.py) measured that prep at 29 ms of the
55 ms scale-0 total at 128x1080p — by far the largest single cost — while
the pad CONTENT only feeds a handful of band-matrix taps. Chained scales
now also pass their block-padded outputs forward directly (valid dims
carried as statics), killing the inter-scale crop copies.

Per-strip dataflow (everything in VMEM):

1. db2 row filter + row decimation fused as ONE banded selection matmul per
   (stream, lo/hi) — the band matrix encodes the top/bottom mirror border
   and the edge-replicated spread halo rows against RAW row indices;
2. db2 column filter + LANE DECIMATION fused as tiled banded matmuls on the
   MXU (one shared (384, 256) LO|HI band for interior 128-lane output
   blocks; the first/last blocks get their own matrices encoding the lane
   mirror). Replaces 4-tap `pltpu.roll` lane convolutions evaluated at
   EVERY lane — the even-offset-only layout made 50% of the decouple/CSF/
   masking/pooling VPU work dead;
3. decoupling (cos 1 deg test, optional NEG gain cap), Watson CSF weighting,
   the 3x3 contrast-masking spread (sublane static slices x lane +-1 rolls
   with edge-replication masks), and the center-crop-masked cube-power sums
   — all on the decimated (half-width) lane grid.

Layout rules honored (CLAUDE.md): static-shift `pltpu.roll` only, no
lane-splitting reshapes, lane-aligned outputs, masked ragged strips,
8-aligned dynamic DMA row offsets.

Replaces the capability the reference buys from libvmaf at
``/root/reference/video_processing.py:280-282``. Exact-math peer of
``vmaf.adm.adm_one_scale`` (scale 0); equivalence tested in interpret mode
and on hardware.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtvqa_tpu.vmaf.adm import (
    DB2_HI,
    DB2_LO,
    _COS_1DEG_SQ,
    _center_crop_slices,
    adm_finalize,

    csf_rfactors,
)

from rtvqa_tpu.kernels.vif_pallas import (  # noqa: E402
    FILTER_PRECISION,
    stage_raw,
    unify_pair,
    vmem_values,
)

STRIP = 32          # decimated (subband-grid) rows produced per grid step —
                    # sized to amortize the ~15 us/cell Mosaic grid + DMA
                    # overhead within the VMEM budget
LO = tuple(float(v) for v in DB2_LO)
HI = tuple(float(v) for v in DB2_HI)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _col_band(j: int, w: int, a_j: int, sw: int, pure: bool):
    """LO|HI column-filter + decimation band matrix for output block j.

    Output decimated column c (global; c' = c - 128j local) contracts raw
    lanes q_t = 2c + t - 2 (t = 0..3) of the ``sw``-lane slice starting at
    ``a_j``. ``pure`` blocks (every tap strictly inside the valid lane
    range) share ONE matrix: l = 2c' + 126 + t, independent of j. Edge
    blocks mirror q < 0 -> -q and q >= w -> 2(w-1) - q (np.pad 'reflect'),
    clipped to the valid range for the garbage output columns beyond the
    decimated width (their values are masked downstream; they only must
    stay finite)."""
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, 128), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, 128), 1)

    def band(tp):
        m = None
        for t, wgt in enumerate(tp):
            if pure:
                hit = l_ids == 2 * c_ids + 126 + t
            else:
                q = 2 * (c_ids + 128 * j) + t - 2
                q = jnp.abs(q)
                q = jnp.where(q >= w, jnp.clip(2 * (w - 1) - q, 0, w - 1), q)
                l_t = q - a_j
                hit = (l_ids == l_t) & (l_t >= 0) & (l_t < sw)
            term = jnp.where(hit, float(wgt), 0.0)
            m = term if m is None else m + term
        return m

    return jnp.concatenate([band(LO), band(HI)], axis=1)  # (sw, 256)


def _lane_filt_plan(w: int, w_arr: int, wq2: int):
    """Static per-block (slice start, slice width, pure?) plan for
    ``_lane_filt_decim``."""
    sw = min(384, w_arr)
    plan = []
    for j in range(wq2 // 128):
        a_j = 0 if j == 0 else 256 * j - 128
        if a_j + sw > w_arr:
            a_j = w_arr - sw
        pure = (
            j > 0 and 256 * j + 255 <= w - 1
            and a_j == 256 * j - 128 and sw == 384
        )
        plan.append((a_j, sw, pure))
    return plan


def _lane_filt_decim(x, bands, plan):
    """Apply the per-block banded column-filter matmuls; returns (lo, hi)
    of shape (rows, 128 * len(plan))."""
    los, his = [], []
    for (a_j, sw, pure), m2 in zip(plan, bands):
        y = jnp.dot(
            x[:, a_j : a_j + sw], m2,
            preferred_element_type=jnp.float32, precision=FILTER_PRECISION,
        )
        los.append(y[:, :128])
        his.append(y[:, 128:])
    lo = los[0] if len(los) == 1 else jnp.concatenate(los, axis=1)
    hi = his[0] if len(his) == 1 else jnp.concatenate(his, axis=1)
    return lo, hi


def build_adm_col_bands(w: int, w_arr: int, wq2: int):
    """Pre-build the column-filter band matrices in XLA (round 3f — see
    ``vif_pallas.build_lane_bands`` for the rationale: Mosaic re-executes
    in-kernel band construction every grid cell). Returns
    ((n_distinct, sw, 256) f32 stack, static (a_j, sw, mat_idx) plan)."""
    plan = _lane_filt_plan(w, w_arr, wq2)
    mats = []
    plan2 = []
    shared_idx = None
    for j, (a_j, sw, pure) in enumerate(plan):
        if pure and shared_idx is not None:
            plan2.append((a_j, sw, shared_idx))
            continue
        if pure:
            shared_idx = len(mats)
        plan2.append((a_j, sw, len(mats)))
        mats.append(_col_band(j, w, a_j, sw, pure))
    return jnp.stack(mats), tuple(plan2)


def _dma_row_start(g0, h_arr: int, rows_in: int):
    """8-aligned raw-row DMA start whose ``rows_in`` window covers every
    band tap of the strip at subband row offset ``g0`` (taps live in raw
    rows [max(0, 2*g0 - 4), 2*(g0 + strip) + 1]). The multiply by 8 is the
    LAST op so Mosaic can prove the sublane-tile divisibility of the
    dynamic slice offset (clip-then-floor forms fail that proof)."""
    return jnp.clip((2 * g0 - 4) // 8, 0, (h_arr - rows_in) // 8) * 8


def _adm0_dma_only_kernel(
    ref_hbm, dis_hbm, sums_ref, rbuf, dbuf, sem_r, sem_d,
    *, strip: int, h_arr: int,
):
    """Profiling stage 0: the production kernel's double-buffered input DMA
    and the small sums write, WITHOUT the two (strip, wq2) output blocks —
    isolates the big-output VMEM->HBM write cost from the input path."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    n_s = pl.num_programs(1)
    rows_in = 2 * strip + 16
    k = i * n_s + s
    slot = jax.lax.rem(k, 2)

    def dma_pair(kk, sl):
        ii = kk // n_s
        ss = jax.lax.rem(kk, n_s)
        st = _dma_row_start(ss * strip, h_arr, rows_in)
        return (
            pltpu.make_async_copy(
                ref_hbm.at[ii, pl.ds(st, rows_in), :], rbuf.at[sl],
                sem_r.at[sl],
            ),
            pltpu.make_async_copy(
                dis_hbm.at[ii, pl.ds(st, rows_in), :], dbuf.at[sl],
                sem_d.at[sl],
            ),
        )

    @pl.when(k == 0)
    def _():
        a, b_ = dma_pair(k, slot)
        a.start()
        b_.start()

    @pl.when(k + 1 < pl.num_programs(0) * n_s)
    def _():
        a, b_ = dma_pair(k + 1, 1 - slot)
        a.start()
        b_.start()

    cur_r, cur_d = dma_pair(k, slot)
    cur_r.wait()
    cur_d.wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sums_ref[0, s, :] = jnp.where(
        lane == 0,
        vmem_values(rbuf[slot][0:1, 0:1])[0, 0]
        + vmem_values(dbuf[slot][0:1, 0:1])[0, 0],
        0.0,
    )[0]


def _adm0_kernel(
    *refs,
    h: int, w: int, h_arr: int, h2: int, w2: int, wq2: int,
    top: int, left: int, fh: float, fd: float, egl, strip: int,
    stages: int = 6, col_plan=None,
):
    """Grid (B, n_strips). Strip s covers subband rows [s*strip, (s+1)*strip).

    The DMA'd window holds RAW luma rows [st, st + rows_in) with the
    8-aligned clamped start from ``_dma_row_start``; banded matrices map
    them to subband rows [s*strip - 1, s*strip + strip + 1) (one spread-halo
    row each side), encoding the reflect border and the subband-grid edge
    replication directly against raw row indices.

    Round 3f: with ``col_plan``, the column-filter band matrices arrive
    pre-built as a VMEM operand (``build_adm_col_bands``) instead of being
    rebuilt on the VPU every grid cell.
    """
    if col_plan is not None:
        (ref_hbm, dis_hbm, colb, sums_ref, aref_out, adis_out,
         rbuf, dbuf, sem_r, sem_d) = refs
    else:
        (ref_hbm, dis_hbm, sums_ref, aref_out, adis_out,
         rbuf, dbuf, sem_r, sem_d) = refs
    i = pl.program_id(0)
    s = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_s = pl.num_programs(1)
    rows_in = 2 * strip + 16
    rows_out = strip + 2
    g0 = s * strip
    st = _dma_row_start(g0, h_arr, rows_in)

    # --- double-buffered input DMA (round 3d) -------------------------------
    # Cell k reads slot k%2, whose DMA was started by cell k-1 (cell 0
    # starts its own); before waiting, it starts cell k+1's DMA into the
    # other slot, so the next strip's HBM reads overlap this strip's
    # compute.
    k = i * n_s + s
    slot = jax.lax.rem(k, 2)

    def dma_pair(kk, sl):
        ii = kk // n_s
        ss = jax.lax.rem(kk, n_s)
        stk = _dma_row_start(ss * strip, h_arr, rows_in)
        return (
            pltpu.make_async_copy(
                ref_hbm.at[ii, pl.ds(stk, rows_in), :], rbuf.at[sl],
                sem_r.at[sl],
            ),
            pltpu.make_async_copy(
                dis_hbm.at[ii, pl.ds(stk, rows_in), :], dbuf.at[sl],
                sem_d.at[sl],
            ),
        )

    @pl.when(k == 0)
    def _():
        a, b_ = dma_pair(k, slot)
        a.start()
        b_.start()

    @pl.when(k + 1 < n_i * n_s)
    def _():
        a, b_ = dma_pair(k + 1, 1 - slot)
        a.start()
        b_.start()

    cur_r, cur_d = dma_pair(k, slot)
    cur_r.wait()
    cur_d.wait()

    # --- stage-bisection early exits (profiling; `stages` is static) --------
    # Each truncated variant performs the SAME output writes (one packed
    # sums row + two (strip, wq2) blocks) so successive deltas isolate one
    # compute stage. stages: 1=DMA only, 2=+row matmuls, 3=+column matmuls,
    # 4=+decouple, 5=+masking spread, 6=full (pooling).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def _early_exit(a, b_, scalar):
        sums_ref[0, s, :] = jnp.where(lane == 0, scalar, 0.0)[0]
        aref_out[0, :, :] = a[1 : strip + 1, 0:wq2]
        adis_out[0, :, :] = b_[1 : strip + 1, 0:wq2]

    if stages <= 1:
        rv0 = vmem_values(rbuf[slot])
        _early_exit(rv0, vmem_values(dbuf[slot]), rv0[0, 0])
        return

    # --- banded row-filter + row-decimation matrices ------------------------
    # Output row r represents subband row g = g0 + r - 1 (r=0 and r=strip+1
    # are the spread halo). Tap t of subband row g_eff = clip(g, 0, h2-1)
    # (edge replication of the SUBBAND grid, matching the oracle's
    # np.pad(mode='edge') in the masking spread) sits at raw row
    # rr = 2*g_eff + t - 2, reflected at both image borders.
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_out, rows_in), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_out, rows_in), 1)
    g = g0 + r_ids - 1
    g_eff = jnp.clip(g, 0, h2 - 1)

    def band_matrix(taps):
        m = None
        for t, wgt in enumerate(taps):
            rr = 2 * g_eff + t - 2
            rr = jnp.abs(rr)                       # reflect top: -k -> k
            rr = jnp.where(rr >= h, 2 * (h - 1) - rr, rr)  # reflect bottom
            term = jnp.where(l_ids == rr - st, float(wgt), 0.0)
            m = term if m is None else m + term
        return m

    # lo and hi row filters stacked into ONE matrix per stream: each matmul
    # is tiny (rows_out x rows_in, e.g. 34 x 80) so a 34-row M dimension
    # wastes 3/4 of the 128-wide systolic rows — stacking doubles MXU row
    # occupancy and halves the matmul dispatches.
    m_both = jnp.concatenate([band_matrix(LO), band_matrix(HI)], axis=0)

    def rows_fused(x):
        both = jnp.dot(
            m_both, x, preferred_element_type=jnp.float32,
            precision=FILTER_PRECISION,
        )
        rows_out = m_both.shape[0] // 2
        return both[:rows_out], both[rows_out:]

    lo_r, hi_r = rows_fused(vmem_values(rbuf[slot]))
    lo_d, hi_d = rows_fused(vmem_values(dbuf[slot]))

    if stages <= 2:
        _early_exit(lo_r, lo_d, hi_r[0, 0] + hi_d[0, 0])
        return

    # --- column filters + lane decimation (MXU banded matmuls) -------------
    w_arr = rbuf.shape[-1]
    if col_plan is not None:
        plan = [(a_j, sw, False) for a_j, sw, _k in col_plan]
        bands = [colb[k] for _a, _sw, k in col_plan]
    else:
        plan = _lane_filt_plan(w, w_arr, wq2)
        shared = None
        bands = []
        for j, (a_j, sw, pure) in enumerate(plan):
            if pure:
                if shared is None:
                    shared = _col_band(j, w, a_j, sw, True)
                bands.append(shared)
            else:
                bands.append(_col_band(j, w, a_j, sw, False))
    oa, oh = _lane_filt_decim(lo_r, bands, plan)
    ov, od = _lane_filt_decim(hi_r, bands, plan)
    ta, th = _lane_filt_decim(lo_d, bands, plan)
    tv, td = _lane_filt_decim(hi_d, bands, plan)

    if stages <= 3:
        _early_exit(oa, ta, oh[0, 0] + ov[0, 0] + od[0, 0] + th[0, 0]
                    + tv[0, 0] + td[0, 0])
        return

    # --- decoupling (vmaf.adm._decouple, scale-0 CSF folded in later) ------
    eps = 1e-30
    ot_dp = oh * th + ov * tv
    angle_ok = (ot_dp >= 0.0) & (
        ot_dp * ot_dp >= _COS_1DEG_SQ * (oh * oh + ov * ov) * (th * th + tv * tv)
    )

    def restore(o, t):
        ratio = t / (o + jnp.where(o >= 0, eps, -eps))
        k = jnp.clip(ratio, 0.0, 1.0)
        rst = k * o
        if egl is None:
            return jnp.where(angle_ok, t, rst)
        k_neg = jnp.clip(ratio, 0.0, float(egl))
        return jnp.where(angle_ok, k_neg * o, rst)

    rh, rv, rd = restore(oh, th), restore(ov, tv), restore(od, td)
    spread_in = (
        jnp.abs((th - rh) * fh) + jnp.abs((tv - rv) * fh) + jnp.abs((td - rd) * fd)
    )

    if stages <= 4:
        _early_exit(oa, ta, spread_in[0, 0])
        return

    # --- 3x3 masking spread (center weight 2, /30) --------------------------
    # Lanes ARE decimated columns; neighbors are +-1, edge-replicated at
    # the image's left/right boundary.
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_out, wq2), 1)
    left_n = jnp.where(
        lane_ids == 0, spread_in, pltpu.roll(spread_in, 1, axis=1)
    )
    right_n = jnp.where(
        lane_ids == w2 - 1, spread_in,
        pltpu.roll(spread_in, wq2 - 1, axis=1),
    )
    rowsum = left_n + spread_in + right_n
    thr = (
        rowsum[0:strip] + rowsum[1 : strip + 1] + rowsum[2 : strip + 2]
        + spread_in[1 : strip + 1]
    ) / 30.0

    if stages <= 5:
        _early_exit(oa, ta, thr[0, 0])
        return

    # --- center-crop-masked L3 pooling partial sums -------------------------
    out_rows = jax.lax.broadcasted_iota(jnp.int32, (strip, wq2), 0) + g0
    j = jax.lax.broadcasted_iota(jnp.int32, (strip, wq2), 1)  # decimated col
    valid = (
        (out_rows >= top) & (out_rows < h2 - top)
        & (j >= left) & (j < w2 - left)
    )

    def pool(rst, orig, f):
        rst_c = rst[1 : strip + 1]
        orig_c = orig[1 : strip + 1]
        masked = jnp.maximum(jnp.abs(rst_c * f) - thr, 0.0)
        num = jnp.sum(jnp.where(valid, masked * masked * masked, 0.0))
        oa_ = jnp.abs(orig_c * f)
        den = jnp.sum(jnp.where(valid, oa_ * oa_ * oa_, 0.0))
        return num, den

    nh, dh = pool(rh, oh, fh)
    nv, dv = pool(rv, ov, fh)
    nd, dd = pool(rd, od, fd)

    packed = jnp.zeros((1, 128), jnp.float32)
    for idx, val in enumerate((nh, dh, nv, dv, nd, dd)):
        packed = jnp.where(lane == idx, val, packed)
    sums_ref[0, s, :] = packed[0]

    # --- approximation bands for scales 1-3 ---------------------------------
    aref_out[0, :, :] = oa[1 : strip + 1]
    adis_out[0, :, :] = ta[1 : strip + 1]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "egl", "interpret", "stages", "h", "w", "crop",
                     "ext_bands"),
)
def adm_scale_pallas(
    ref_y: jnp.ndarray, dis_y: jnp.ndarray, scale: int = 0,
    egl=None, interpret: bool = False, stages: int = 6,
    h: int | None = None, w: int | None = None, crop: bool = True,
    ext_bands: bool = True,
):
    """Fused ADM at one scale over (B, H, W) luma (the scale's approximation
    band — the original luma at scale 0).

    The db2 DWT taps are scale-invariant; only the Watson CSF weights and
    the input size change per level, so one kernel serves all four scales.
    ``h``/``w`` give the VALID input dims when the arrays carry block
    padding (the chained a_ref/a_dis outputs do); rows/lanes beyond them are
    ignored (they only must be finite). With ``crop=False`` the returned
    approximation bands keep their block padding — the chaining path uses
    this to avoid two full-size crop copies per scale.

    Returns (num (B,), den (B,), a_ref, a_dis): this scale's pooling
    contributions (offsets included) and the next scale's inputs
    ((B, H2, W2) when cropped).
    """
    b, h_in, w_in = ref_y.shape
    h = h_in if h is None else h
    w = w_in if w is None else w
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    # Adaptive strip (round 3, as in vif_pallas): VMEM scales with strip x
    # padded width — NARROW deeper scales afford taller strips. Doubling
    # strips (9/3/2/2 cells at 1080p) was measured NEUTRAL on the v5e (131
    # vs 125 ms for 128x1080p all-scales): the kernel is not
    # per-cell-overhead-bound — don't re-derive this.
    if w > 2048:
        # Wide frames (1440p/4K class): kernel stack temporaries scale with
        # strip x lanes — strip 24 overflows the 16 MB scoped-VMEM stack
        # budget (24.7 MB f32 / 21.9 MB raw-int8 at 3840 lanes, measured
        # 2026-08-18 on v5e; ~16.5 MB extrapolated at 2560). The threshold
        # matches the raw-int8 staging gate below so the whole >2048 band
        # runs strip 8 + f32 staging (ADVICE r3 #1).
        strip = 8
    elif w >= 1536:
        # 24 (not 32): the raw-input kernel carries three column band
        # matrices (interior + both lane-mirror edges) and a 16-row DMA
        # window margin — strip 32 exceeds the 16 MB scoped-VMEM budget by
        # ~0.9 MB at 1920 lanes (measured). Cell count is NOT a cost here.
        strip = 24
    elif w >= 640:
        strip = 2 * STRIP
    else:
        strip = 4 * STRIP
    while strip > 16 and strip - h2 >= 16:
        strip //= 2
    # The raw-input DMA window needs rows_in <= input rows.
    while strip > 8 and 2 * strip + 16 > h_in:
        strip //= 2
    n_strips = -(-h2 // strip)
    wq2 = 128 * (-(-w2 // 128))  # decimated lane width (output blocks)
    rows_in = 2 * strip + 16

    # Raw-input fast path: everything border-related lives in the kernel's
    # band matrices. A single cheap edge-pad fallback covers inputs whose
    # storage doesn't meet the DMA alignment contract (lane width % 128,
    # rows % 8, rows >= window) — never hit by 1080p/4K or chained scales.
    pad_rows = max(_round_up(h_in, 8), rows_in) - h_in
    pad_lanes = _round_up(w_in, 128) - w_in

    ref_y, dis_y = unify_pair(ref_y, dis_y)
    if _round_up(w_in, 128) > 2048 and ref_y.dtype == jnp.uint8:
        # Raw-int8 staging is gated to widths <= 2048: at 4K the in-VMEM
        # int8->f32 value rebuilds add full-strip f32 stack copies on top
        # of this kernel's own temporaries and overflow the 16 MB
        # scoped-VMEM stack budget (measured 21.9 MB, 2026-08-18). f32
        # staging (the pre-3i dataflow) compiles and validates at 4K; the
        # astype cost at 4K is dwarfed by the kernel itself.
        ref_y = ref_y.astype(jnp.float32)
        dis_y = dis_y.astype(jnp.float32)
    ref_p = stage_raw(ref_y, pad_rows, pad_lanes)
    dis_p = stage_raw(dis_y, pad_rows, pad_lanes)
    buf_dtype = ref_p.dtype  # int8 for raw uint8 inputs (round 3i)

    h_arr = h_in + pad_rows
    w_arr = w_in + pad_lanes

    ys, xs = _center_crop_slices(h2, w2)
    top, left = ys.start, xs.start
    area = (ys.stop - ys.start) * (xs.stop - xs.start)
    offset = (area / 32.0) ** (1.0 / 3.0)
    fh, _, fd = csf_rfactors(scale)  # fh == fv at every scale

    if stages == 0:
        # Profiling: input path + sums only (see _adm0_dma_only_kernel).
        sums = pl.pallas_call(
            functools.partial(
                _adm0_dma_only_kernel, strip=strip, h_arr=h_arr
            ),
            out_shape=jax.ShapeDtypeStruct((b, n_strips, 128), jnp.float32),
            grid=(b, n_strips),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, n_strips, 128), lambda i, s: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, rows_in, w_arr), buf_dtype),
                pltpu.VMEM((2, rows_in, w_arr), buf_dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(ref_p, dis_p)
        z = jnp.zeros((b, h2, w2), jnp.float32)
        return jnp.sum(sums[..., 0], axis=-1), jnp.sum(sums[..., 1], -1), z, z

    inputs = [ref_p, dis_p]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    col_plan = None
    if ext_bands:
        colb, col_plan = build_adm_col_bands(w, w_arr, wq2)
        inputs.append(colb)
        in_specs.append(pl.BlockSpec(
            colb.shape, lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM
        ))

    sums, a_ref, a_dis = pl.pallas_call(
        functools.partial(
            _adm0_kernel,
            h=h, w=w, h_arr=h_arr, h2=h2, w2=w2, wq2=wq2, top=top, left=left,
            fh=float(fh), fd=float(fd), egl=egl, strip=strip, stages=stages,
            col_plan=col_plan,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_strips, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, n_strips * strip, wq2), jnp.float32),
            jax.ShapeDtypeStruct((b, n_strips * strip, wq2), jnp.float32),
        ),
        grid=(b, n_strips),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, n_strips, 128), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, strip, wq2), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, strip, wq2), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows_in, w_arr), buf_dtype),
            pltpu.VMEM((2, rows_in, w_arr), buf_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*inputs)

    third = 1.0 / 3.0
    # sums holds per-strip partials — reduce over strips BEFORE the cube root.
    num0 = (
        jnp.sum(sums[..., 0], axis=-1) ** third
        + jnp.sum(sums[..., 2], axis=-1) ** third
        + jnp.sum(sums[..., 4], axis=-1) ** third
        + 3.0 * offset
    )
    den0 = (
        jnp.sum(sums[..., 1], axis=-1) ** third
        + jnp.sum(sums[..., 3], axis=-1) ** third
        + jnp.sum(sums[..., 5], axis=-1) ** third
        + 3.0 * offset
    )
    if crop:
        # Kernel lanes ARE the decimated grid — just crop the block padding.
        return num0, den0, a_ref[:, :h2, :w2], a_dis[:, :h2, :w2]
    return num0, den0, a_ref, a_dis


def adm_scale0_pallas(
    ref_y: jnp.ndarray, dis_y: jnp.ndarray, egl=None, interpret: bool = False
):
    """Fused ADM scale 0 (see ``adm_scale_pallas``)."""
    return adm_scale_pallas(ref_y, dis_y, 0, egl=egl, interpret=interpret)


def adm_features_pallas(
    ref_y: jnp.ndarray, dis_y: jnp.ndarray, enhn_gain_limit=None
) -> dict[str, jnp.ndarray]:
    """adm2 with every DWT level as the fused Pallas kernel (the XLA levels
    materialize ~20 HBM intermediates each even at quarter size). Matches
    ``vmaf.adm.adm_features``. Chained scales pass their block-padded
    approximation bands forward uncropped (valid dims as statics) — no
    inter-scale crop copies."""
    interpret = jax.default_backend() == "cpu"
    num = den = 0.0
    o, t = ref_y, dis_y
    h, w = int(ref_y.shape[-2]), int(ref_y.shape[-1])
    for scale in range(4):
        n_s, d_s, o, t = adm_scale_pallas(
            o, t, scale, egl=enhn_gain_limit, interpret=interpret,
            h=h, w=w, crop=False,
        )
        h, w = (h + 1) // 2, (w + 1) // 2
        num = num + n_s
        den = den + d_s
    return {"adm2": adm_finalize(num, den, ref_y.shape)}
