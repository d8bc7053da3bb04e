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
import os

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
    # LO rows live at block offset 0, HI rows at ``rows_blk`` (8-aligned so
    # the post-lane-filter splits are sublane-aligned slices); the padding
    # rows carry all-zero band weights, so the stacked matmul's valid rows
    # are bit-identical to the unstacked form.
    rows_blk = _round_up(rows_out, 8)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, rows_in), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, rows_in), 1)
    g = g0 + r_ids - 1
    g_eff = jnp.clip(g, 0, h2 - 1)

    def band_matrix(taps):
        m = None
        for t, wgt in enumerate(taps):
            rr = 2 * g_eff + t - 2
            rr = jnp.abs(rr)                       # reflect top: -k -> k
            rr = jnp.where(rr >= h, 2 * (h - 1) - rr, rr)  # reflect bottom
            term = jnp.where(
                (l_ids == rr - st) & (r_ids < rows_out), float(wgt), 0.0
            )
            m = term if m is None else m + term
        return m

    # lo and hi row filters stacked into ONE matrix per stream: each matmul
    # is tiny (rows_out x rows_in, e.g. 34 x 80) so a 34-row M dimension
    # wastes 3/4 of the 128-wide systolic rows — stacking doubles MXU row
    # occupancy and halves the matmul dispatches. The lo/hi outputs stay
    # STACKED through the lane filter (round 4): one banded matmul of M=80
    # per stream/block instead of two of M=34 — half the dispatches and
    # pipeline fills on the col stage (measured 12.9 ms of the 37 ms kernel).
    m_both = jnp.concatenate([band_matrix(LO), band_matrix(HI)], axis=0)

    def rows_fused(x):
        return jnp.dot(
            m_both, x, preferred_element_type=jnp.float32,
            precision=FILTER_PRECISION,
        )

    both_r = rows_fused(vmem_values(rbuf[slot]))
    both_d = rows_fused(vmem_values(dbuf[slot]))

    if stages <= 2:
        _early_exit(both_r[:rows_out], both_d[:rows_out],
                    both_r[rows_blk, 0] + both_d[rows_blk, 0])
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
    lo_l_r, hi_l_r = _lane_filt_decim(both_r, bands, plan)
    lo_l_d, hi_l_d = _lane_filt_decim(both_d, bands, plan)
    oa, ov = lo_l_r[:rows_out], lo_l_r[rows_blk : rows_blk + rows_out]
    oh, od = hi_l_r[:rows_out], hi_l_r[rows_blk : rows_blk + rows_out]
    ta, tv = lo_l_d[:rows_out], lo_l_d[rows_blk : rows_blk + rows_out]
    th, td = hi_l_d[:rows_out], hi_l_d[rows_blk : rows_blk + rows_out]

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
    # Fold the crop mask into the threshold ONCE: the 1e30 sentinel makes
    # the num hinge exactly 0 outside the crop PROVIDED |rst*f| stays well
    # below 1e30 (true by construction: inputs are uint8-derived, |rst*f|
    # < 1e6); the den CSF factor is a per-band constant, pulled out of the
    # cube as a post-sum scalar. NOTE this reassociates the den pooling —
    # sum(|o|^3)*f^3 instead of libvmaf's sum(|o*f|^3) — so per-ELEMENT
    # roundings differ (validated ≤2e-5 on device; deliberate divergence,
    # recorded in docs/PARITY.md).
    w_thr = jnp.where(valid, thr, 1e30)

    def pool(rst, orig, f):
        rst_c = rst[1 : strip + 1]
        orig_c = orig[1 : strip + 1]
        masked = jnp.maximum(jnp.abs(rst_c * f) - w_thr, 0.0)
        num = jnp.sum(masked * masked * masked)
        oa_ = jnp.abs(jnp.where(valid, orig_c, 0.0))
        den = jnp.sum(oa_ * oa_ * oa_) * (f * f * f)
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
                     "ext_bands", "wide_strip", "wide_raw"),
)
def adm_scale_pallas(
    ref_y: jnp.ndarray, dis_y: jnp.ndarray, scale: int = 0,
    egl=None, interpret: bool = False, stages: int = 6,
    h: int | None = None, w: int | None = None, crop: bool = True,
    ext_bands: bool = True, wide_strip: int | None = None,
    wide_raw: bool = True,
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
        # strip x lanes — strip 24 overflows the DEFAULT 16 MB scoped-VMEM
        # stack budget (24.7 MB f32 / 21.9 MB raw-int8 at 3840 lanes,
        # measured 2026-08-18 on v5e). Round 5 raises the budget to 64 MB
        # at wide widths (the chip has 128 MB; the raw vif_tail already
        # runs at 32 MB), so the 1536-2048 band's strip 24 + raw-int8
        # staging carries over. ``wide_strip`` overrides for on-device A/B
        # (8 = the round-3/4 config).
        strip = wide_strip or 24
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
    if (_round_up(w_in, 128) > 2048 and ref_y.dtype == jnp.uint8
            and not wide_raw):
        # wide_raw=False restores the round-3/4 wide config: f32 staging
        # (the raw-int8 in-VMEM rebuild's full-strip f32 stack copies
        # overflowed the DEFAULT 16 MB scoped budget at 3840 lanes —
        # measured 21.9 MB; the round-5 64 MB wide budget holds it).
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
        # Round 5: wide frames run strip 24 + raw-int8 under a raised
        # scoped-VMEM budget (see the strip comment above).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ) if w > 2048 else None,
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


# ADM scales 1-3 implementation: "tail" (one per-frame kernel, round 4 —
# mirrors kernels.vif_pallas.vif_tail_pallas) or "chain" (the per-scale strip
# kernels) — env-switchable for on-device A/B.
_ADM_TAIL_MODE = os.environ.get("RTVQA_ADM_TAIL", "tail")


def _tail_row_band(g0: int, st: int, ch: int, win: int, h_s: int, h2_s: int):
    """LO-over-HI stacked db2 row-filter + row-decimation band for one tail
    chunk — the static-offset peer of ``_adm0_kernel``'s in-cell band: output
    row r is subband row g = g0 + r - 1 (r=0 / r=ch+1 are the spread halo),
    edge-replicated on the subband grid and reflected at the image borders,
    taps addressed relative to the VMEM window starting at raw row ``st``.
    The LO/HI blocks are padded to 8-aligned ``rows_blk`` with zero-weight
    rows so the stacked output can ride the lane filter un-split (round 4,
    same scheme as ``_adm0_kernel``)."""
    rows_blk = _round_up(ch + 2, 8)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, win), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, win), 1)
    g_eff = jnp.clip(g0 + r_ids - 1, 0, h2_s - 1)

    def band(taps):
        m = None
        for t, wgt in enumerate(taps):
            rr = 2 * g_eff + t - 2
            rr = jnp.abs(rr)
            rr = jnp.where(rr >= h_s, 2 * (h_s - 1) - rr, rr)
            term = jnp.where(
                (l_ids == rr - st) & (r_ids < ch + 2), float(wgt), 0.0
            )
            m = term if m is None else m + term
        return m

    return jnp.concatenate([band(LO), band(HI)], axis=0)


def _adm_tail_kernel(
    ref_hbm, dis_hbm, *refs, dims: tuple, egl, plans: tuple,
):
    """Grid (B,): ADM scales 1-3 for ONE frame per cell — the whole scale-1
    approximation pair (written block-padded by the scale-0 kernel) lives in
    VMEM; scales 2 and 3 chain through VMEM scratch with no HBM round trips.

    Each scale runs in static row chunks of ``ch`` subband rows (bounding the
    live decouple/masking temporaries); per chunk the dataflow is exactly
    ``_adm0_kernel`` stages 2-6: stacked db2 row matmul, banded column
    filter + lane decimation (pre-built bands via ``build_adm_col_bands``),
    decoupling, the 3x3 masking spread, and the center-crop-masked L3
    pooling partial sums, accumulated across chunks into per-band scalars.

    Replaces three strip kernels (~1150 grid cells at 128x1080p) and their
    inter-scale approximation-band HBM round trips (round 4; the same
    restructuring won ~19 ms for VIF scales 1-3). Capability parity:
    /root/reference/video_processing.py:280-282 (libvmaf ADM feature).
    """
    (colb1, colb2, colb3, out_ref,
     rbuf, dbuf, r2_buf, d2_buf, r3_buf, d3_buf, sem_r, sem_d) = refs
    i = pl.program_id(0)

    dma_r = pltpu.make_async_copy(ref_hbm.at[i], rbuf, sem_r)
    dma_d = pltpu.make_async_copy(dis_hbm.at[i], dbuf, sem_d)
    dma_r.start()
    dma_d.start()
    dma_r.wait()
    dma_d.wait()

    def scale_pass(src_r, src_d, colb, col_plan, h_s, w_s, ch, n_ch,
                   fh, fd, dst_r, dst_d):
        """One ADM scale over VMEM-resident inputs in static row chunks;
        returns the scale's six pooling partials (nh, dh, nv, dv, nd, dd)
        and writes the approximation bands into ``dst_r``/``dst_d``."""
        h2_s, w2_s = (h_s + 1) // 2, (w_s + 1) // 2
        src_rows = src_r.shape[0]
        win = min(2 * ch + 16, src_rows)
        plan = [(a_j, sw, False) for a_j, sw, _k in col_plan]
        bands = [colb[k] for _a, _sw, k in col_plan]
        wq2_s = 128 * len(plan)
        ys, xs = _center_crop_slices(h2_s, w2_s)
        top, left = ys.start, xs.start
        acc = [jnp.float32(0.0)] * 6
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (ch + 2, wq2_s), 1)
        g_rows = jax.lax.broadcasted_iota(jnp.int32, (ch, wq2_s), 0)
        g_lanes = jax.lax.broadcasted_iota(jnp.int32, (ch, wq2_s), 1)

        rows_blk = _round_up(ch + 2, 8)
        for c in range(n_ch):
            g0 = c * ch
            st = min(max((2 * g0 - 4) // 8, 0), (src_rows - win) // 8) * 8
            m_both = _tail_row_band(g0, st, ch, win, h_s, h2_s)

            def rows_fused(x):
                return jnp.dot(
                    m_both, x, preferred_element_type=jnp.float32,
                    precision=FILTER_PRECISION,
                )

            both_r = rows_fused(src_r[st : st + win])
            both_d = rows_fused(src_d[st : st + win])
            lo_l_r, hi_l_r = _lane_filt_decim(both_r, bands, plan)
            lo_l_d, hi_l_d = _lane_filt_decim(both_d, bands, plan)
            oa = lo_l_r[: ch + 2]
            ov = lo_l_r[rows_blk : rows_blk + ch + 2]
            oh = hi_l_r[: ch + 2]
            od = hi_l_r[rows_blk : rows_blk + ch + 2]
            ta = lo_l_d[: ch + 2]
            tv = lo_l_d[rows_blk : rows_blk + ch + 2]
            th = hi_l_d[: ch + 2]
            td = hi_l_d[rows_blk : rows_blk + ch + 2]

            # Decoupling (vmaf.adm._decouple semantics, NEG cap in-kernel).
            eps = 1e-30
            ot_dp = oh * th + ov * tv
            angle_ok = (ot_dp >= 0.0) & (
                ot_dp * ot_dp
                >= _COS_1DEG_SQ * (oh * oh + ov * ov) * (th * th + tv * tv)
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
                jnp.abs((th - rh) * fh) + jnp.abs((tv - rv) * fh)
                + jnp.abs((td - rd) * fd)
            )

            # 3x3 masking spread, lane edge replication at the image border.
            left_n = jnp.where(
                lane_ids == 0, spread_in, pltpu.roll(spread_in, 1, axis=1)
            )
            right_n = jnp.where(
                lane_ids == w2_s - 1, spread_in,
                pltpu.roll(spread_in, wq2_s - 1, axis=1),
            )
            rowsum = left_n + spread_in + right_n
            thr = (
                rowsum[0:ch] + rowsum[1 : ch + 1] + rowsum[2 : ch + 2]
                + spread_in[1 : ch + 1]
            ) / 30.0

            valid = (
                (g_rows + g0 >= top) & (g_rows + g0 < h2_s - top)
                & (g_lanes >= left) & (g_lanes < w2_s - left)
            )
            # Crop mask folded into the threshold; den CSF factor pulled
            # out as a post-sum scalar (see ``_adm0_kernel``'s pool).
            w_thr = jnp.where(valid, thr, 1e30)

            def pool(rst, orig, f):
                rst_c = rst[1 : ch + 1]
                orig_c = orig[1 : ch + 1]
                masked = jnp.maximum(jnp.abs(rst_c * f) - w_thr, 0.0)
                num = jnp.sum(masked * masked * masked)
                oa_ = jnp.abs(jnp.where(valid, orig_c, 0.0))
                den = jnp.sum(oa_ * oa_ * oa_) * (f * f * f)
                return num, den

            for idx, (rst, orig, f) in enumerate(
                ((rh, oh, fh), (rv, ov, fh), (rd, od, fd))
            ):
                n_c, d_c = pool(rst, orig, f)
                acc[2 * idx] = acc[2 * idx] + n_c
                acc[2 * idx + 1] = acc[2 * idx + 1] + d_c

            if dst_r is not None:
                dst_r[c * ch : (c + 1) * ch, :] = oa[1 : ch + 1]
                dst_d[c * ch : (c + 1) * ch, :] = ta[1 : ch + 1]
        return acc

    (h1, w1, ch1, n1), (h2s, w2s, ch2, n2), (h3s, w3s, ch3, n3) = dims
    (col_p1, col_p2, col_p3) = plans
    fh1, _, fd1 = csf_rfactors(1)
    fh2, _, fd2 = csf_rfactors(2)
    fh3, _, fd3 = csf_rfactors(3)

    acc1 = scale_pass(rbuf, dbuf, colb1, col_p1, h1, w1, ch1, n1,
                      float(fh1), float(fd1), r2_buf, d2_buf)
    acc2 = scale_pass(r2_buf, d2_buf, colb2, col_p2, h2s, w2s, ch2, n2,
                      float(fh2), float(fd2), r3_buf, d3_buf)
    acc3 = scale_pass(r3_buf, d3_buf, colb3, col_p3, h3s, w3s, ch3, n3,
                      float(fh3), float(fd3), None, None)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    packed = jnp.zeros((1, 128), jnp.float32)
    for ln, val in enumerate(acc1 + acc2 + acc3):
        packed = jnp.where(lane == ln, val, packed)
    out_ref[0, :, :] = jnp.broadcast_to(packed, (8, 128))


@functools.partial(
    jax.jit, static_argnames=("egl", "interpret", "h", "w")
)
def adm_tail_pallas(
    a_ref: jnp.ndarray, a_dis: jnp.ndarray, egl=None,
    interpret: bool = False, h: int | None = None, w: int | None = None,
):
    """ADM scales 1-3 over the scale-0 kernel's approximation bands, as ONE
    per-frame Pallas kernel (``_adm_tail_kernel``).

    ``a_ref``/``a_dis``: (B, H1p, W1p) float32 scale-1 inputs, possibly
    block-padded (``adm_scale_pallas(..., crop=False)``); ``h``/``w`` give
    the VALID scale-1 dims. Returns ``{"num": (B,), "den": (B,)}`` — the
    summed scale-1..3 pooling contributions INCLUDING the per-band cbrt
    offsets, exactly matching three chained ``adm_scale_pallas`` calls.

    Sized for scale-1 widths <= ~1024 lanes and ~600 rows (1080p-class):
    the whole scale-1 frame pair plus the scale-2/3 scratch must fit VMEM.
    Callers route bigger inputs to the per-scale chain.
    """
    b, h1_in, w1_in = a_ref.shape
    h1 = h1_in if h is None else h
    w1 = w1_in if w is None else w

    def plan_chunks(h2_s: int, src_rows: int) -> tuple[int, int]:
        """Subband rows per chunk (multiple of 8 — approx writes are ch-row
        sublane slices) and chunk count; the DMA-style window 2*ch + 16 must
        fit the source buffer rows."""
        ch = 64
        while ch > 8 and (2 * ch + 16 > src_rows or ch - h2_s >= ch // 2):
            ch //= 2
        return ch, -(-h2_s // ch)

    # Row/lane padding so the chunk windows stay inside the buffers.
    pad_rows = max(_round_up(h1_in, 8), 32) - h1_in
    pad_lanes = _round_up(w1_in, 128) - w1_in
    ref_p = stage_raw(a_ref.astype(jnp.float32), pad_rows, pad_lanes)
    dis_p = stage_raw(a_dis.astype(jnp.float32), pad_rows, pad_lanes)
    rows1 = h1_in + pad_rows
    warr1 = w1_in + pad_lanes

    h2, w2 = (h1 + 1) // 2, (w1 + 1) // 2
    wq2_1 = 128 * (-(-w2 // 128))
    ch1, n1 = plan_chunks(h2, rows1)
    rows2 = n1 * ch1
    h3, w3 = (h2 + 1) // 2, (w2 + 1) // 2
    wq2_2 = 128 * (-(-w3 // 128))
    ch2, n2 = plan_chunks(h3, rows2)
    rows3 = n2 * ch2
    h4, w4 = (h3 + 1) // 2, (w3 + 1) // 2
    wq2_3 = 128 * (-(-w4 // 128))
    ch3, n3 = plan_chunks(h4, rows3)

    colb1, col_p1 = build_adm_col_bands(w1, warr1, wq2_1)
    colb2, col_p2 = build_adm_col_bands(w2, wq2_1, wq2_2)
    colb3, col_p3 = build_adm_col_bands(w3, wq2_2, wq2_3)
    dims = ((h1, w1, ch1, n1), (h2, w2, ch2, n2), (h3, w3, ch3, n3))

    band_ins = [colb1, colb2, colb3]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ] + [
        pl.BlockSpec(bnd.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        for bnd in band_ins
    ]

    out = pl.pallas_call(
        functools.partial(
            _adm_tail_kernel, dims=dims, egl=egl,
            plans=(col_p1, col_p2, col_p3),
        ),
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((rows1, warr1), jnp.float32),
            pltpu.VMEM((rows1, warr1), jnp.float32),
            pltpu.VMEM((rows2, wq2_1), jnp.float32),
            pltpu.VMEM((rows2, wq2_1), jnp.float32),
            pltpu.VMEM((rows3, wq2_2), jnp.float32),
            pltpu.VMEM((rows3, wq2_2), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        # Wide scale-1 inputs (4K-class, round 5): the whole-frame staging
        # is ~17 MB alone — raise the scoped-VMEM budget past the 16 MB
        # default (the chip has 128 MB).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ) if warr1 > 1024 else None,
        interpret=interpret,
    )(ref_p, dis_p, *band_ins)

    packed = out[:, 0, :]
    third = 1.0 / 3.0
    num = den = 0.0
    for scale, (hs, ws) in ((1, (h2, w2)), (2, (h3, w3)), (3, (h4, w4))):
        ys, xs = _center_crop_slices(hs, ws)
        area = (ys.stop - ys.start) * (xs.stop - xs.start)
        offset = (area / 32.0) ** third
        base = 6 * (scale - 1)
        num = num + (
            packed[:, base] ** third + packed[:, base + 2] ** third
            + packed[:, base + 4] ** third + 3.0 * offset
        )
        den = den + (
            packed[:, base + 1] ** third + packed[:, base + 3] ** third
            + packed[:, base + 5] ** third + 3.0 * offset
        )
    return {"num": num, "den": den}


def adm_features_pallas(
    ref_y: jnp.ndarray, dis_y: jnp.ndarray, enhn_gain_limit=None, tail=None
) -> dict[str, jnp.ndarray]:
    """adm2 with every DWT level as a fused Pallas kernel (the XLA levels
    materialize ~20 HBM intermediates each even at quarter size). Matches
    ``vmaf.adm.adm_features``.

    Scale 0 is the strip kernel; scales 1-3 run as ONE per-frame tail kernel
    (``adm_tail_pallas``, round 4) when the scale-1 frame pair fits its VMEM
    staging (1080p-class), else as the chained per-scale strip kernels with
    block-padded approximation bands passed forward uncropped (no
    inter-scale crop copies). ``tail`` forces the choice (None = auto;
    RTVQA_ADM_TAIL=chain disables for on-device A/B)."""
    interpret = jax.default_backend() == "cpu"
    h, w = int(ref_y.shape[-2]), int(ref_y.shape[-1])
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    if tail is None:
        # Whole-frame scale-1 staging: 2 x (rows x lanes) f32 in VMEM.
        stage_mb = _round_up(h2, 64) * _round_up(w2, 128) * 8 / 1e6
        tail = _ADM_TAIL_MODE != "chain" and stage_mb <= 5.0

    num, den, o, t = adm_scale_pallas(
        ref_y, dis_y, 0, egl=enhn_gain_limit, interpret=interpret,
        h=h, w=w, crop=False,
    )
    if tail:
        tl = adm_tail_pallas(
            o, t, egl=enhn_gain_limit, interpret=interpret, h=h2, w=w2
        )
        num = num + tl["num"]
        den = den + tl["den"]
    else:
        hs, ws = h2, w2
        for scale in (1, 2, 3):
            n_s, d_s, o, t = adm_scale_pallas(
                o, t, scale, egl=enhn_gain_limit, interpret=interpret,
                h=hs, w=ws, crop=False,
            )
            hs, ws = (hs + 1) // 2, (ws + 1) // 2
            num = num + n_s
            den = den + d_s
    return {"adm2": adm_finalize(num, den, ref_y.shape)}
