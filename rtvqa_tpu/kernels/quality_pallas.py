"""Fused Pallas TPU kernel: VIF scale 0 + PSNR + x264 SSIM + motion blur/SAD.

Round-2 cost model (CLAUDE.md): of the 0.37 s quality phase at 128x1080p,
"program A" (PSNR plane MSEs, x264 SSIM on Y/U/V, blurred-luma motion SADs —
replacing the psnr/ssim filters and motion feature of
``/root/reference/video_processing.py:275-282``) cost 0.10 s as a plain XLA
program and had never been kernel-fused (VERDICT r2 next #2). Its inputs are
the SAME ref/dis planes the fused VIF scale-0 kernel already stages into
VMEM row strips with an 8-row/8-lane halo — so this kernel computes program
A *inside* the VIF scale-0 strip pass at near-zero marginal cost: no new
grid cells (the per-cell Mosaic+DMA overhead dominates these kernels), no
extra luma reads, ~+15% per-cell MXU work.

Per (strip, frame) grid cell, on top of the VIF scale-0 statistics and the
scale-1 decimation (kernels.vif_pallas dataflow, shared helpers):

* **plane SSEs** — masked sums of (ref-dis)^2 for Y (from the staged luma
  strips) and U/V (chroma strips DMA'd into the same cell);
* **x264 SSIM partial sums** for Y/U/V — 4x4 block sums of r, d, r^2+d^2,
  r*d via one banded row-pool matmul over the already-stacked moment buffer
  plus lane-pool band matmuls (8 ones per output lane — NOT the dense
  (n, n//4) pooling matrices of metrics.quality, which burn K/4x the MXU
  work and made program A matmul-bound), then the 2x2 window aggregation
  and the integer-constant rational, summed over the strip's valid windows;
* **motion blur + SAD** — the 5-tap FILTER_5 separable blur evaluated with
  10 static rolls over the halo'd strip, SAD'd against the previous frame's
  blurred strip carried in a VMEM scratch across grid cells (grid is
  strip-major, frame-minor, and Mosaic grids run sequentially on the core,
  so cell (s, i) always directly follows (s, i-1)); frame 0 SADs against
  the chunk's carried blur plane, DMA'd per strip.

Outputs per frame: VIF scale-0 num/den, SSE Y/U/V, SSIM window sums Y/U/V,
blur-SAD sum (packed per-cell scalars), the scale-1 decimated ref/dis, and
the blurred last frame (the next chunk's motion carry).

Equivalence: exact-match tests vs metrics.quality (block sums are integer-
exact in f32 via HIGHEST-precision matmuls) and vmaf.motion/vif in
interpret mode; on-device parity is asserted by ``bench.py --validate``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtvqa_tpu.kernels.vif_pallas import (
    _EPS,
    _dma_row_start,
    _filt_lanes_ext,
    _filt_lanes_raw,
    _filt_rows_raw,
    _round_up,
    _vif_stats_sums,
    build_lane_bands,
    resolve_fast3,
    stage_raw,
    unify_pair,
    vmem_values,
)
from rtvqa_tpu.vmaf.filters import gaussian_kernel
from rtvqa_tpu.vmaf.motion import FILTER_5

_SSIM_C1 = int(0.01 * 0.01 * 255 * 255 * 64 + 0.5)  # 416 (x264 integer form)
_SSIM_C2 = int(0.03 * 0.03 * 255 * 255 * 64 * 63 + 0.5)  # 235963

STRIP = 32  # tallest strip that fits Mosaic's DEFAULT 16 MB scoped-VMEM
# budget at 1080p widths — the vmem_limit_bytes raise below is keyed to it.
DEFAULT_STRIP = 48  # round-5 production default: on-device A/B at all three
# production widths (probes/STRIP_AB_r05.json, depth-1 pipelined, 5 reps,
# within one session) — 1080p chunk 128: s32 112.6 / s48 108.2 / s64 111.6
# ms; 1440p chunk 36: 54.3 / 52.1 / 55.0; 4K chunk 16: 52.7 / 50.9 / 53.1.
# 48 wins ~3-4% everywhere (fewer grid cells under the raised budget);
# 64 is neutral-to-worse. Numerics vs s32 <= 3.3e-7 on device.
HALO = 8  # 17-tap VIF moment filter half-width; >= blur (2) and SSIM (4)

# Packed per-cell scalar lanes.
LANE_VIF_NUM, LANE_VIF_DEN = 0, 1
LANE_SSE_Y, LANE_SSE_U, LANE_SSE_V = 2, 3, 4
LANE_SSIM_Y, LANE_SSIM_U, LANE_SSIM_V = 5, 6, 7
LANE_SAD = 8


def _int_parts(x, n: int):
    """Split an INTEGER-valued f32 array into ``n`` bf16 parts that sum to
    ``x`` EXACTLY — valid while |x| <= 2^(8 + 9*(n-1)) (bf16 keeps 8
    significant bits; each nearest-rounding residual is an integer 2^9x
    smaller, and integers <= 2^8 are bf16-exact). n=2 covers uint8 products
    (<= 255^2 < 2^16); n=3 covers their 4x4 block sums (< 2^20)."""
    parts = []
    rem = x
    for _ in range(n - 1):
        p = rem.astype(jnp.bfloat16)
        parts.append(p)
        rem = rem - p.astype(jnp.float32)
    parts.append(rem.astype(jnp.bfloat16))
    return parts


def _dot_int_rows(band01, x, n: int):
    """``band01 @ x`` for a 0/1 band and INTEGER-valued ``x`` as ``n``
    native-bf16 MXU passes — bit-identical to a HIGHEST (6-pass) f32 matmul
    for in-range integers (round 4: the x264 SSIM pooling sums are integer
    math; 2-3 exact passes replace 6)."""
    b = band01.astype(jnp.bfloat16)
    out = None
    for p in _int_parts(x, n):
        z = jnp.dot(b, p, preferred_element_type=jnp.float32)
        out = z if out is None else out + z
    return out


def _pool4_lane_band(sw: int, delta: int):
    """(sw, 128) band for ``x @ M`` lane pooling: output lane c sums slice
    lanes [delta + 4c, delta + 4c + 4) — dim 0 is the matmul's INPUT
    (contraction) axis, dim 1 the output lane. Out-of-slice taps (clamped
    edge tiles' garbage output lanes) contribute zero."""
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, 128), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, 128), 1)
    m = None
    for t in range(4):
        l_t = delta + 4 * c_ids + t
        term = jnp.where((i_ids == l_t) & (l_t < sw), 1.0, 0.0)
        m = term if m is None else m + term
    return m


def _ssim_row_band_y(ro, rows, nbr_y, st_y=16):
    """Luma SSIM row-pooling band (see the kernel docstring): out row
    o = m * st_y + br sums 4 buffer rows of stacked moment m starting at
    buffer row ro + 4*br; moment 2 sums both the r^2 and d^2 segments.
    ``ro`` may be traced (in-kernel path) or static (ext-bands path).
    ``st_y`` (static) is the per-moment row stride — 16 covers strips up
    to 60 rows (nbr_y + halo row <= 15); taller strips use 32 (round 5)."""
    shape = (4 * st_y, 5 * rows)
    o_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    m_ids = o_ids // st_y
    br = o_ids % st_y
    seg_of_m = jnp.where(
        m_ids == 0, 0, jnp.where(m_ids == 1, 1, jnp.where(m_ids == 2, 2, 4))
    )
    base = seg_of_m * rows + ro + 4 * br
    band = None
    for t in range(4):
        hit = (l_ids == base + t) & (br <= nbr_y)
        hit2 = (m_ids == 2) & (l_ids == base + rows + t) & (br <= nbr_y)
        term = jnp.where(hit | hit2, 1.0, 0.0)
        band = term if band is None else band + term
    return band


def _ssim_row_band_c(crows, nbr_c, st_c=8):
    """Chroma SSIM row-pooling band: 8 moments (u x4 then v x4), static.
    ``st_c`` is the per-moment row stride — 8 covers chroma strips up to
    28 rows (nbr_c + halo row <= 7); taller strips use 16 (round 5)."""
    shape = (8 * st_c, 8 * crows)
    o_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    m_ids = o_ids // st_c
    br = o_ids % st_c
    base = m_ids * crows + 4 * br
    band = None
    for t in range(4):
        term = jnp.where((l_ids == base + t) & (br <= nbr_c), 1.0, 0.0)
        band = term if band is None else band + term
    return band


def build_pool4_bands(w_arr: int, n_tiles: int, data_off: int):
    """Pre-build the 4x lane-pooling band matrices (round 3f — see
    ``vif_pallas.build_lane_bands`` for the rationale). Returns
    ((n_distinct, sw, 128) stack, static (a_t, mat_idx) plan, sw)."""
    sw = min(640, w_arr)
    deltas = {}
    mats = []
    plan = []
    for t in range(n_tiles):
        a_t = min(((data_off + 512 * t) // 128) * 128, w_arr - sw)
        delta = data_off + 512 * t - a_t
        if delta not in deltas:
            deltas[delta] = len(mats)
            mats.append(_pool4_lane_band(sw, delta))
        plan.append((a_t, deltas[delta]))
    return jnp.stack(mats), tuple(plan), sw


def _lane_pool4_ext(x, bands_ref, plan, sw: int, int_exact: bool = False):
    """4x lane pooling with PRE-BUILT bands (``build_pool4_bands``).

    ``int_exact``: x holds integers < 2^20 (SSIM row-pooled uint8 sums) —
    pool with 3 exact bf16 passes (``_int_parts``) instead of a 6-pass
    HIGHEST matmul; bit-identical result (round 4)."""
    if int_exact:
        parts = _int_parts(x, 3)
        outs = []
        for a, k in plan:
            b = bands_ref[k].astype(jnp.bfloat16)
            z = None
            for p in parts:
                zz = jnp.dot(p[:, a : a + sw], b,
                             preferred_element_type=jnp.float32)
                z = zz if z is None else z + zz
            outs.append(z)
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    outs = [
        jnp.dot(x[:, a : a + sw], bands_ref[k],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        for a, k in plan
    ]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _lane_pool4(x, n_tiles, data_off, int_exact: bool = False):
    """4x lane pooling of ``x`` via tiled band matmuls; returns
    (rows, 128 * n_tiles) block sums: output lane c of tile t sums input
    lanes [data_off + 4*(128t + c), ...+4). Slices are 128-lane-aligned and
    clamped into the array (static per-tile band offset delta < 128 + the
    clamp slack; taps of garbage output lanes beyond the valid width fall
    outside the slice and the band zeroes them — valid-lane coverage holds
    whenever data_off + valid_width <= x width, which both callers satisfy
    by construction)."""
    w_arr = x.shape[-1]
    sw = min(640, w_arr)
    bands = {}
    outs = []
    parts = _int_parts(x, 3) if int_exact else None
    for t in range(n_tiles):
        a_t = min(((data_off + 512 * t) // 128) * 128, w_arr - sw)
        delta = data_off + 512 * t - a_t
        if delta not in bands:
            bands[delta] = _pool4_lane_band(sw, delta)
        if int_exact:
            b = bands[delta].astype(jnp.bfloat16)
            z = None
            for p in parts:
                zz = jnp.dot(p[:, a_t : a_t + sw], b,
                             preferred_element_type=jnp.float32)
                z = zz if z is None else z + zz
            outs.append(z)
        else:
            outs.append(
                jnp.dot(x[:, a_t : a_t + sw], bands[delta],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            )
    return outs[0] if n_tiles == 1 else jnp.concatenate(outs, axis=1)


def _ssim_from_windows(win, br_mod, n_br_valid, wr_base, n_win_rows, n_win_cols):
    """x264 ssim_end1 over a (4 * br_mod, n_lanes) window-sum stack
    [s1 | s2 | ss | s12] (segments of ``br_mod`` rows); returns the masked
    scalar sum of per-window SSIM.

    ``wr_base`` = first global window row of this strip; window row
    ``wr_base + br`` is valid when br < n_br_valid and the global row is
    < n_win_rows; window col < n_win_cols. The slice height is static:
    8 rows for the default 32-row strips, rounded up to the next sublane
    multiple for taller strips (round 5 — n_br_valid < br_mod always, so
    the halo row the pre-roll needed stays inside the moment's stride).
    """
    n_take = max(8, -(-n_br_valid // 8) * 8)
    s1 = win[0 * br_mod : 0 * br_mod + n_take]
    s2 = win[1 * br_mod : 1 * br_mod + n_take]
    ss = win[2 * br_mod : 2 * br_mod + n_take]
    s12 = win[3 * br_mod : 3 * br_mod + n_take]
    vars_ = ss * 64.0 - s1 * s1 - s2 * s2
    covar = s12 * 64.0 - s1 * s2
    num = (2.0 * s1 * s2 + _SSIM_C1) * (2.0 * covar + _SSIM_C2)
    den = (s1 * s1 + s2 * s2 + _SSIM_C1) * (vars_ + _SSIM_C2)
    ssim = num / den
    rows = jax.lax.broadcasted_iota(jnp.int32, ssim.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, ssim.shape, 1)
    valid = (
        (rows < n_br_valid)
        & (wr_base + rows < n_win_rows)
        & (cols < n_win_cols)
    )
    return jnp.sum(jnp.where(valid, ssim, 0.0))


def _masked_sq_sum(diff, n_rows_valid, row_off, lane_off, n_lanes):
    rows = jax.lax.broadcasted_iota(jnp.int32, diff.shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, diff.shape, 1)
    valid = (
        (rows >= row_off)
        & (rows < row_off + n_rows_valid)
        & (lanes >= lane_off)
        & (lanes < lane_off + n_lanes)
    )
    return jnp.sum(jnp.where(valid, diff * diff, 0.0))


def _roll2(x, shift_rows, shift_lanes):
    """Circular shifts (pltpu.roll takes non-negative shifts only — negative
    shifts are expressed modulo the axis size)."""
    y = x
    if shift_rows:
        y = pltpu.roll(y, shift=shift_rows % y.shape[0], axis=0)
    if shift_lanes:
        y = pltpu.roll(y, shift=shift_lanes % y.shape[1], axis=1)
    return y


def _fused_q_kernel(
    *refs,
    h: int, w: int, h_arr: int, wq2: int, h2: int, w2: int,
    n_tiles_y: int, n_tiles_c: int, taps_stats, taps_dec, egl, strip: int,
    fast3: bool = False, stages: int = 6, plans=None, emit_dec: bool = True,
):
    """Grid (n_strips, B) — strip-major, frame-minor (the blur_prev scratch
    carries frame i-1's blurred strip into cell (s, i)).

    Round 3e: reads the RAW (unpadded) luma — reflect borders live in the
    band matrices (``vif_pallas._lane_band_raw`` / ``_filt_rows_raw``), the
    DMA window is the 8-aligned clamp of [s*strip - 8, s*strip + strip + 8),
    and the motion blur runs as banded HIGHEST matmuls instead of rolls
    over a pre-padded buffer. The XLA astype+pad luma prep this removes
    measured ~30 ms/kernel/128-frame chunk (scripts/probe_adm_stages.py
    methodology). The scale-1 decimation now also fuses its 2x LANE
    decimation into the dec lane bands (stride=2), writing half-width dec
    outputs directly (the external even_lanes matmul + crop are gone).
    Chroma keeps its cheap zero-pad staging (quarter-size planes, and the
    960-wide 1080p chroma isn't 128-lane-aligned raw).

    Round 3f: when ``plans`` is given, the stats/dec/blur LANE band matrices
    arrive as VMEM operands pre-built by ``vif_pallas.build_lane_bands``
    (constant index_map — copied once, not per cell) instead of being
    rebuilt on the VPU in every grid cell.
    """
    refs = list(refs)
    (ref_hbm, dis_hbm, ru_hbm, du_hbm, rv_hbm, dv_hbm, pblur_hbm) = refs[:7]
    idx = 7
    if plans is not None:
        (stats_b, dec_b, blur_b, ssim_y_b, ssim_c_b,
         pool_y_b, pool_c_b) = refs[7:14]
        idx = 14
        (stats_plan, dec_plan, blur_plan,
         pool_y_plan, pool_y_sw, pool_c_plan, pool_c_sw) = plans
    out_ref = refs[idx]
    idx += 1
    if emit_dec:
        dec_ref_out, dec_dis_out = refs[idx], refs[idx + 1]
        idx += 2
    else:
        # Round 4: the VIF tail kernel computes the scale-1 decimation
        # itself from the raw luma — no dec outputs, no stage-6 compute.
        dec_ref_out = dec_dis_out = None
    (blur_out, rbuf, dbuf, cbufs, pblur_buf, blur_prev,
     sem_r, sem_d, sem_c, sem_p) = refs[idx:]
    s = pl.program_id(0)
    i = pl.program_id(1)
    rows = strip + 16  # 8-row halo each side (17-tap moment filter)
    cstrip = strip // 2
    crows = cstrip + 8  # bottom block-row halo (4) rounded to sublane 8
    row0 = s * strip
    st = _dma_row_start(row0, h_arr, rows)
    ro = row0 - st  # buffer-local row of the strip's first image row

    # --- DMAs ---------------------------------------------------------------
    dma_r = pltpu.make_async_copy(
        ref_hbm.at[i, pl.ds(st, rows), :], rbuf, sem_r
    )
    dma_d = pltpu.make_async_copy(
        dis_hbm.at[i, pl.ds(st, rows), :], dbuf, sem_d
    )
    dma_r.start()
    dma_d.start()
    dmas_c = []
    for ci, chbm in enumerate((ru_hbm, du_hbm, rv_hbm, dv_hbm)):
        dma = pltpu.make_async_copy(
            chbm.at[i, pl.ds(s * cstrip, crows), :], cbufs.at[ci], sem_c.at[ci]
        )
        dma.start()
        dmas_c.append(dma)

    @pl.when(i == 0)
    def _():
        dma_p = pltpu.make_async_copy(
            pblur_hbm.at[pl.ds(s * strip, strip), :], pblur_buf, sem_p
        )
        dma_p.start()
        dma_p.wait()
        blur_prev[...] = pblur_buf[...]

    dma_r.wait()
    dma_d.wait()

    r = vmem_values(rbuf[...])
    d = vmem_values(dbuf[...])
    w_arr = rbuf.shape[-1]
    strip_valid = jnp.minimum(strip, h - row0)
    # Raw uint8 values are integers <= 255 — EXACT in bf16 (round 4): their
    # fast3 lo splits are exactly zero (skippable matmuls) and the SSIM
    # pooling — integer math by construction — runs as 2-3 exact native-bf16
    # passes instead of 6-pass HIGHEST f32 matmuls. Bit-identical outputs.
    int_exact = rbuf.dtype == jnp.int8
    c_int_exact = cbufs.dtype == jnp.int8

    # --- stage-bisection early exits (profiling; `stages` is static) --------
    # Constant output writes per stage so successive deltas isolate compute.
    # 1=DMA, 2=+progA luma (SSE/blur/SAD), 3=+SSIM luma, 4=+chroma,
    # 5=+VIF0 stats, 6=full (+dec).
    half_s = strip // 2
    _lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def _early_exit(scalar):
        # Every started DMA must be awaited before the cell ends — an
        # un-awaited async copy corrupts the semaphore state on hardware
        # (measured: FAILED_PRECONDITION device error).
        for dma in dmas_c:
            dma.wait()
        out_ref[0, :, :] = jnp.broadcast_to(
            jnp.where(_lane1 == 0, scalar, 0.0), (8, 128)
        )
        if emit_dec:
            dec_ref_out[0, :, :] = r[0:half_s, 0:wq2]
            dec_dis_out[0, :, :] = d[0:half_s, 0:wq2]
        blur_out[...] = r[0:strip, :]

    if stages <= 1:
        _early_exit(r[0, 0] + d[0, 0])
        return

    # --- program A, luma: SSE + blur/SAD + SSIM block sums ------------------
    sse_y = _masked_sq_sum(r - d, strip_valid, ro, 0, w)

    # FILTER_5 motion blur as banded matmuls (reflect borders in-band);
    # always HIGHEST — never fast3 — to keep the motion feature exact.
    taps_blur = tuple(float(v) for v in FILTER_5)
    blur_rows = _filt_rows_raw(
        r, taps_blur, 1, strip, rows, 1, row0, st, h, False,
        precision=jax.lax.Precision.HIGHEST,
    )
    if plans is not None:
        blur_cur = _filt_lanes_ext(
            blur_rows, blur_b, blur_plan, False,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        blur_cur = _filt_lanes_raw(
            blur_rows, taps_blur, w, w_arr // 128, 1, False,
            precision=jax.lax.Precision.HIGHEST,
        )
    rowsb = jax.lax.broadcasted_iota(jnp.int32, blur_cur.shape, 0)
    lanesb = jax.lax.broadcasted_iota(jnp.int32, blur_cur.shape, 1)
    bvalid = (rowsb < strip_valid) & (lanesb < w)
    sad_sum = jnp.sum(
        jnp.where(bvalid, jnp.abs(blur_cur - blur_prev[...]), 0.0)
    )
    blur_prev[...] = blur_cur
    blur_out[...] = blur_cur

    if stages <= 2:
        for dma in dmas_c:
            dma.wait()
        out_ref[0, :, :] = jnp.broadcast_to(
            jnp.where(_lane1 == 0, sse_y + sad_sum, 0.0), (8, 128)
        )
        if emit_dec:
            dec_ref_out[0, :, :] = r[0:half_s, 0:wq2]
            dec_dis_out[0, :, :] = d[0:half_s, 0:wq2]
        return

    # Stacked moments (shared with the VIF filters below; the row-pass
    # matmuls take the per-segment arrays directly — round 4).
    rr_m, dd_m, rd_m = r * r, d * d, r * d
    stacked = jnp.concatenate([r, d, rr_m, dd_m, rd_m], axis=0)

    # SSIM row pooling: out row o = m * 16 + br (m in 0..3, br in 0..8 used)
    # sums 4 buffer rows of the stacked segment(s) of moment m; moment 2 is
    # r^2 + d^2 (ones in two segments). Block row br starts at buffer row
    # ro + 4*br (per-strip static in the ext-bands stack).
    nbr_y = strip // 4  # window rows per strip (block rows minus halo)
    st_y = 16 if nbr_y + 1 <= 16 else 32  # per-moment row stride (static)

    ssim_band_y = (
        ssim_y_b[0] if plans is not None
        else _ssim_row_band_y(ro, rows, nbr_y, st_y)
    )
    if int_exact:
        # stacked holds integers <= 255^2 < 2^16 -> 2 exact bf16 passes;
        # the pooled sums are < 2^20 -> 3 passes in the lane pool.
        row_pooled = _dot_int_rows(ssim_band_y, stacked, 2)
    else:
        row_pooled = jnp.dot(
            ssim_band_y, stacked,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if plans is not None:
        bs_y = _lane_pool4_ext(
            row_pooled, pool_y_b, pool_y_plan, pool_y_sw, int_exact
        )
    else:
        bs_y = _lane_pool4(row_pooled, n_tiles_y, 0, int_exact)
    win_y = bs_y + _roll2(bs_y, -1, 0)
    win_y = win_y + _roll2(win_y, 0, -1)
    ssim_y_sum = _ssim_from_windows(
        win_y, st_y, nbr_y, nbr_y * s, h // 4 - 1, w // 4 - 1
    )

    # --- program A, chroma: SSE + SSIM for U and V --------------------------
    if stages <= 3:
        for dma in dmas_c:
            dma.wait()
        out_ref[0, :, :] = jnp.broadcast_to(
            jnp.where(_lane1 == 0, ssim_y_sum, 0.0), (8, 128)
        )
        if emit_dec:
            dec_ref_out[0, :, :] = r[0:half_s, 0:wq2]
            dec_dis_out[0, :, :] = d[0:half_s, 0:wq2]
        return

    for dma in dmas_c:
        dma.wait()
    cu_r, cu_d, cv_r, cv_d = (
        vmem_values(cbufs[0]), vmem_values(cbufs[1]),
        vmem_values(cbufs[2]), vmem_values(cbufs[3]),
    )
    c_valid = jnp.minimum(cstrip, h2 - s * cstrip)
    sse_u = _masked_sq_sum(cu_r - cu_d, c_valid, 0, 8, w2)
    sse_v = _masked_sq_sum(cv_r - cv_d, c_valid, 0, 8, w2)

    stacked_c = jnp.concatenate(
        [cu_r, cu_d, cu_r * cu_r + cu_d * cu_d, cu_r * cu_d,
         cv_r, cv_d, cv_r * cv_r + cv_d * cv_d, cv_r * cv_d], axis=0
    )

    nbr_c = cstrip // 4
    st_c = 8 if nbr_c + 1 <= 8 else 16

    ssim_band_c = (
        ssim_c_b[...] if plans is not None
        else _ssim_row_band_c(crows, nbr_c, st_c)
    )
    if c_int_exact:
        row_pooled_c = _dot_int_rows(ssim_band_c, stacked_c, 2)
    else:
        row_pooled_c = jnp.dot(
            ssim_band_c, stacked_c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if plans is not None:
        bs_c = _lane_pool4_ext(
            row_pooled_c, pool_c_b, pool_c_plan, pool_c_sw, c_int_exact
        )
    else:
        bs_c = _lane_pool4(row_pooled_c, n_tiles_c, 8, c_int_exact)
    win_c = bs_c + _roll2(bs_c, -1, 0)
    win_c = win_c + _roll2(win_c, 0, -1)
    ssim_u_sum = _ssim_from_windows(
        win_c[0 : 4 * st_c], st_c, nbr_c, nbr_c * s, h2 // 4 - 1, w2 // 4 - 1
    )
    ssim_v_sum = _ssim_from_windows(
        win_c[4 * st_c : 8 * st_c], st_c, nbr_c, nbr_c * s,
        h2 // 4 - 1, w2 // 4 - 1
    )

    if stages <= 4:
        out_ref[0, :, :] = jnp.broadcast_to(
            jnp.where(_lane1 == 0, ssim_u_sum + ssim_v_sum + sse_u + sse_v,
                      0.0), (8, 128)
        )
        if emit_dec:
            dec_ref_out[0, :, :] = r[0:half_s, 0:wq2]
            dec_dis_out[0, :, :] = d[0:half_s, 0:wq2]
        return

    # --- VIF scale 0 (kernels.vif_pallas dataflow, verbatim; row pass
    # FIRST — it shrinks the sublane extent before the lane pass) ------------
    mom_rows = _filt_rows_raw(
        [r, d, rr_m, dd_m, rd_m], taps_stats, 5, strip, rows, 1,
        row0, st, h, fast3,
        exact_segs=(int_exact, int_exact, False, False, False),
    )
    if plans is not None:
        mom = _filt_lanes_ext(mom_rows, stats_b, stats_plan, fast3)
    else:
        mom = _filt_lanes_raw(mom_rows, taps_stats, w, w_arr // 128, 1, fast3)
    num_sum, den_sum = _vif_stats_sums(mom, strip, strip_valid, w, egl)

    if stages <= 5:
        out_ref[0, :, :] = jnp.broadcast_to(
            jnp.where(_lane1 == 0, num_sum + den_sum, 0.0), (8, 128)
        )
        if emit_dec:
            dec_ref_out[0, :, :] = r[0:half_s, 0:wq2]
            dec_dis_out[0, :, :] = d[0:half_s, 0:wq2]
        return

    # --- scale-1 pre-decimation filter + 2x decimation (both axes fused) ----
    # Skipped entirely under emit_dec=False (round 4): the VIF tail kernel
    # re-derives the scale-1 inputs from the raw luma at per-frame MXU
    # shapes (M~160 vs M=32 here — this stage bisected at 13.7 ms).
    if emit_dec:
        half = strip // 2
        dec_rows = _filt_rows_raw(
            [r, d], taps_dec, 2, half, rows, 2, row0, st, h, fast3,
            exact_segs=(int_exact, int_exact),
        )
        if plans is not None:
            dec = _filt_lanes_ext(dec_rows, dec_b, dec_plan, fast3)
        else:
            dec = _filt_lanes_raw(dec_rows, taps_dec, w, wq2 // 128, 2, fast3)
        dec_ref_out[0, :, :] = dec[0:half]
        dec_dis_out[0, :, :] = dec[half : 2 * half]

    # --- packed per-cell scalars --------------------------------------------
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    packed = jnp.zeros((1, 128), jnp.float32)
    for ln, val in (
        (LANE_VIF_NUM, num_sum), (LANE_VIF_DEN, den_sum),
        (LANE_SSE_Y, sse_y), (LANE_SSE_U, sse_u), (LANE_SSE_V, sse_v),
        (LANE_SSIM_Y, ssim_y_sum), (LANE_SSIM_U, ssim_u_sum),
        (LANE_SSIM_V, ssim_v_sum), (LANE_SAD, sad_sum),
    ):
        packed = jnp.where(lane == ln, val, packed)
    # Mosaic requires >=8 sublanes per output block: broadcast the scalar
    # row; the host wrapper reads sublane 0 of each cell's 8-row group.
    out_ref[0, :, :] = jnp.broadcast_to(packed, (8, 128))


@functools.partial(
    jax.jit,
    static_argnames=("egl", "interpret", "fast3", "crop", "stages",
                     "ext_bands", "emit_dec", "wide_strip"),
)
def quality_fused_pallas(
    ry, ru, rv, dy, du, dv, prev_blur, egl=None, interpret: bool = False,
    fast3=None, crop: bool = True, stages: int = 6, ext_bands: bool = True,
    emit_dec: bool = True, wide_strip: int | None = None,
):
    """Fused VIF-scale-0 + program-A over YUV420 batches.

    Args: luma (B, H, W) and chroma (B, H/2, W/2) planes (uint8 or float),
    ``prev_blur`` (H, W) float32 — the blurred last ref-luma of the previous
    chunk (zeros for the first; the caller masks frame 0's SAD).

    The kernel reads the RAW luma (no XLA pad prep — round 3e, see
    ``_fused_q_kernel``); uint8 inputs are additionally bitcast to int8 and
    rebuilt in VMEM (round 3i, ``vif_pallas.stage_raw``/``vmem_values``) —
    no full-res ``astype(f32)`` HBM round trip and 4x less input DMA. With
    ``crop=False`` the dec outputs keep their block padding for the VIF
    scale-1 kernel to consume without crop copies (pass ``h=ceil(H/2),
    w=ceil(W/2)`` to it).

    ``fast3`` (None = auto, ``vif_pallas.resolve_fast3``) selects the manual
    3-pass bf16 scheme for the VIF moment/decimation filter matmuls ONLY —
    the SSIM pooling matmuls always stay HIGHEST (integer exactness is a
    correctness guarantee) and PSNR/motion run HIGHEST banded matmuls.

    Returns a dict: ``vif_scale0`` (B,), plane SSE sums ``sse_y/u/v`` (B,),
    SSIM window sums ``ssim_y/u/v_sum`` (B,), ``sad_sum`` (B,), the scale-1
    decimated ``dec_ref``/``dec_dis`` (B, ceil(H/2), ceil(W/2) when
    cropped), and ``blur_carry`` (H, W). Window counts / plane sizes for
    the final means are static — see ``metrics.full_reference``.
    """
    b, h, w = ry.shape
    h2, w2 = ru.shape[-2], ru.shape[-1]
    # VMEM scales with strip x width: 32 rows fits 1080p-class widths in the
    # default 16 MB scoped budget; anything taller or wider RAISES the
    # scoped budget instead (the chip has 128 MB — strip 16 at 3840 lanes
    # measured 17.0 MB). Production default = 48-row strips at EVERY width:
    # fewer grid cells win ~3-4% over 32 at 1080p/1440p/4K and 64 gives it
    # back (see the DEFAULT_STRIP A/B table above; earlier waypoints: 4K
    # strip 32 = 76.7 ms/16-frame chunk vs strip 16 = 83.7,
    # scripts/probe_wide_fused.py). ``wide_strip`` overrides for A/B.
    strip = wide_strip or DEFAULT_STRIP
    while strip > 8 and strip + 16 > h:
        # Raw-input DMA window must fit the array rows. Step down through
        # sublane multiples (48 -> 24 -> 8): strip must stay % 8 == 0 (the
        # chroma strip is strip//2 and block rows are strip//4).
        strip = max(8, (strip // 2) // 8 * 8)
    n_strips = -(-h // strip)
    h_pad = n_strips * strip
    rows = strip + 16
    cstrip = strip // 2
    crows = cstrip + 8
    n_tiles_y = -(-(w // 4) // 128)
    n_tiles_c = -(-(w2 // 4) // 128)
    wc_buf = 512 * (n_tiles_c - 1) + 640
    wd = (w + 1) // 2
    wq2 = 128 * (-(-wd // 128))  # dec output lane blocks

    taps_stats = tuple(float(v) for v in gaussian_kernel(17, 17 / 5.0))
    taps_dec = tuple(float(v) for v in gaussian_kernel(9, 9 / 5.0))

    # DMA alignment fallback (never hit at 1080p/4K): lane width % 128,
    # rows % 8, rows >= window.
    pad_rows_y = max(_round_up(h, 8), rows) - h
    pad_lanes_y = _round_up(w, 128) - w

    h_arr = h + pad_rows_y
    w_arr = w + pad_lanes_y

    def prep_chroma(x):
        # Buffer col = orig col + 8 (shared lane-pool band matrix); rows
        # bottom-padded for the halo block row + sublane-aligned DMA.
        # uint8 inputs stay uint8 (zero pad, then int8 bitcast in stage_raw).
        h2p = n_strips * cstrip + 8
        x = jnp.pad(x, ((0, 0), (0, h2p - h2), (8, wc_buf - w2 - 8)))
        return stage_raw(x, 0, 0)

    ry, dy = unify_pair(ry, dy)
    ru, du, rv, dv = unify_pair(ru, du, rv, dv)
    ref_p = stage_raw(ry, pad_rows_y, pad_lanes_y)
    dis_p = stage_raw(dy, pad_rows_y, pad_lanes_y)
    luma_dtype = ref_p.dtype  # int8 for raw uint8 inputs (round 3i)
    ru_p = prep_chroma(ru)
    du_p = prep_chroma(du)
    rv_p = prep_chroma(rv)
    dv_p = prep_chroma(dv)
    chroma_dtype = ru_p.dtype
    pblur_p = jnp.pad(
        prev_blur.astype(jnp.float32),
        ((0, h_pad - h), (0, w_arr - w)),
    )

    out_shape = jax.ShapeDtypeStruct((b, n_strips * 8, 128), jnp.float32)
    out_spec = pl.BlockSpec(
        (1, 8, 128), lambda s, i: (i, s, 0), memory_space=pltpu.VMEM
    )
    dec_shape = jax.ShapeDtypeStruct(
        (b, n_strips * strip // 2, wq2), jnp.float32
    )
    dec_spec = pl.BlockSpec(
        (1, strip // 2, wq2), lambda s, i: (i, s, 0), memory_space=pltpu.VMEM
    )
    blur_shape = jax.ShapeDtypeStruct((n_strips * strip, w_arr), jnp.float32)
    blur_spec = pl.BlockSpec(
        (strip, w_arr), lambda s, i: (s, 0), memory_space=pltpu.VMEM
    )

    f3 = resolve_fast3(fast3)
    inputs = [ref_p, dis_p, ru_p, du_p, rv_p, dv_p, pblur_p]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 7
    plans = None
    if ext_bands:
        # Round 3f: band matrices built ONCE in XLA, passed as VMEM
        # operands (see vif_pallas.build_lane_bands).
        taps_blur = tuple(float(v) for v in FILTER_5)
        stats_bands, stats_plan = build_lane_bands(
            taps_stats, w, w_arr, w_arr // 128, 1, f3)
        dec_bands, dec_plan = build_lane_bands(
            taps_dec, w, w_arr, wq2 // 128, 2, f3)
        blur_bands, blur_plan = build_lane_bands(
            taps_blur, w, w_arr, w_arr // 128, 1, False)
        # SSIM row bands: the luma band depends on the strip's DMA offset
        # ro = row0 - st (static per strip) — stacked per strip, BlockSpec-
        # indexed by s. The chroma band and the pool4 lane bands are
        # strip-invariant.
        nbr_y = strip // 4
        st_y = 16 if nbr_y + 1 <= 16 else 32
        st_c = 8 if cstrip // 4 + 1 <= 8 else 16
        ssim_y_bands = jnp.stack([
            _ssim_row_band_y(
                s * strip
                - min(max((s * strip - 8) // 8, 0), (h_arr - rows) // 8) * 8,
                rows, nbr_y, st_y,
            )
            for s in range(n_strips)
        ])
        ssim_c_band = _ssim_row_band_c(crows, cstrip // 4, st_c)
        pool_y_bands, pool_y_plan, pool_y_sw = build_pool4_bands(
            w_arr, n_tiles_y, 0)
        pool_c_bands, pool_c_plan, pool_c_sw = build_pool4_bands(
            wc_buf, n_tiles_c, 8)
        # int-exact pooling (round 4) consumes the 0/1 bands in bf16 — cast
        # once here so the per-cell astype is a no-op.
        if luma_dtype == jnp.int8:
            ssim_y_bands = ssim_y_bands.astype(jnp.bfloat16)
            pool_y_bands = pool_y_bands.astype(jnp.bfloat16)
        if chroma_dtype == jnp.int8:
            ssim_c_band = ssim_c_band.astype(jnp.bfloat16)
            pool_c_bands = pool_c_bands.astype(jnp.bfloat16)
        plans = (stats_plan, dec_plan, blur_plan,
                 pool_y_plan, pool_y_sw, pool_c_plan, pool_c_sw)
        for bnd in (stats_bands, dec_bands, blur_bands):
            inputs.append(bnd)
            in_specs.append(pl.BlockSpec(
                bnd.shape, lambda s, i: (0, 0, 0), memory_space=pltpu.VMEM
            ))
        inputs.append(ssim_y_bands)
        in_specs.append(pl.BlockSpec(
            (1,) + ssim_y_bands.shape[1:], lambda s, i: (s, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        inputs.append(ssim_c_band)
        in_specs.append(pl.BlockSpec(
            ssim_c_band.shape, lambda s, i: (0, 0), memory_space=pltpu.VMEM
        ))
        for bnd in (pool_y_bands, pool_c_bands):
            inputs.append(bnd)
            in_specs.append(pl.BlockSpec(
                bnd.shape, lambda s, i: (0, 0, 0), memory_space=pltpu.VMEM
            ))

    if emit_dec:
        out_shapes = (out_shape, dec_shape, dec_shape, blur_shape)
        out_specs = (out_spec, dec_spec, dec_spec, blur_spec)
    else:
        out_shapes = (out_shape, blur_shape)
        out_specs = (out_spec, blur_spec)
    outs = pl.pallas_call(
        functools.partial(
            _fused_q_kernel, h=h, w=w, h_arr=h_arr, wq2=wq2, h2=h2, w2=w2,
            n_tiles_y=n_tiles_y, n_tiles_c=n_tiles_c,
            taps_stats=taps_stats, taps_dec=taps_dec, egl=egl, strip=strip,
            fast3=f3, stages=stages, plans=plans, emit_dec=emit_dec,
        ),
        out_shape=out_shapes,
        grid=(n_strips, b),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((rows, w_arr), luma_dtype),          # rbuf
            pltpu.VMEM((rows, w_arr), luma_dtype),          # dbuf
            pltpu.VMEM((4, crows, wc_buf), chroma_dtype),   # chroma bufs
            pltpu.VMEM((strip, w_arr), jnp.float32),        # pblur dma buf
            pltpu.VMEM((strip, w_arr), jnp.float32),        # blur_prev carry
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        # Wide frames (w > 2048) exceed Mosaic's default 16 MB scoped-VMEM
        # budget (17.0 MB at 3840 lanes / strip 16) — raise it like the raw
        # vif_tail does; 64 MB also covers strip-24/32 A/B configs.
        compiler_params=pltpu.CompilerParams(
            # strip 32 at 3840 lanes measured ~2x the 17 MB strip-16
            # footprint; wide AND tall together need more headroom still
            # (the chip has 128 MB).
            vmem_limit_bytes=(96 if (w > 2048 and strip > STRIP) else 64)
            * 1024 * 1024
        ) if (w > 2048 or strip > STRIP) else None,
        interpret=interpret,
    )(*inputs)

    if emit_dec:
        packed, dec_r, dec_d, blur_carry = outs
    else:
        packed, blur_carry = outs
    packed = packed.reshape(b, n_strips, 8, 128)[:, :, 0, :]
    vif_num = jnp.sum(packed[:, :, LANE_VIF_NUM], axis=-1)
    vif_den = jnp.sum(packed[:, :, LANE_VIF_DEN], axis=-1)

    out = {
        "vif_scale0": vif_num / jnp.maximum(vif_den, _EPS),
        "sse_y": jnp.sum(packed[:, :, LANE_SSE_Y], axis=-1),
        "sse_u": jnp.sum(packed[:, :, LANE_SSE_U], axis=-1),
        "sse_v": jnp.sum(packed[:, :, LANE_SSE_V], axis=-1),
        "ssim_y_sum": jnp.sum(packed[:, :, LANE_SSIM_Y], axis=-1),
        "ssim_u_sum": jnp.sum(packed[:, :, LANE_SSIM_U], axis=-1),
        "ssim_v_sum": jnp.sum(packed[:, :, LANE_SSIM_V], axis=-1),
        "sad_sum": jnp.sum(packed[:, :, LANE_SAD], axis=-1),
        "blur_carry": blur_carry[:h, :w],
    }
    if emit_dec:
        hd = (h + 1) // 2
        if crop:
            dec_r = dec_r[:, :hd, :wd]
            dec_d = dec_d[:, :hd, :wd]
        out["dec_ref"] = dec_r
        out["dec_dis"] = dec_d
    return out
