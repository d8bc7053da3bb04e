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

Per-strip dataflow (everything in VMEM):

1. db2 row filter + row decimation fused as ONE banded selection matmul per
   (stream, lo/hi) — the band matrix also encodes the mirror border and the
   edge-replicated spread halo rows, so no in-kernel boundary branches;
2. db2 column filter + LANE DECIMATION fused as tiled banded matmuls on the
   MXU (one shared (384, 256) LO|HI band per 128-lane output block — the
   ``_filt_lanes_mxu`` pattern of ``vif_pallas``). Round 3d: this replaced
   4-tap `pltpu.roll` lane convolutions evaluated at EVERY lane (decimation
   by masking), and halves the lane width of everything downstream — the
   even-offset-only layout made 50% of the decouple/CSF/masking/pooling VPU
   work dead;
3. decoupling (cos 1 deg test, optional NEG gain cap), Watson CSF weighting,
   the 3x3 contrast-masking spread (sublane static slices x lane +-1 rolls
   with edge-replication masks), and the center-crop-masked cube-power sums
   — all on the decimated (half-width) lane grid.

Layout rules honored (CLAUDE.md): static-shift `pltpu.roll` only, no
lane-splitting reshapes, lane-aligned outputs, masked ragged strips.

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

from rtvqa_tpu.kernels.vif_pallas import FILTER_PRECISION  # noqa: E402

STRIP = 32          # decimated (subband-grid) rows produced per grid step —
                    # sized to amortize the ~15 us/cell Mosaic grid + DMA
                    # overhead (the dominant kernel cost at 1080p) within the
                    # VMEM budget
HALO_IN = 4         # input mirror halo (covers db2 reflect depth 2 + spread)
LO = tuple(float(v) for v in DB2_LO)
HI = tuple(float(v) for v in DB2_HI)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lane_filt_decim(x, wq2):
    """db2 column filter + LANE DECIMATION fused as tiled banded matmuls on
    the MXU (the ``vif_pallas._filt_lanes_mxu`` pattern, plus the stride-2
    decimation folded into the band): output lane c = decimated column c =
    sum_t taps[t] * x[:, 2c + 2 + t] (the +2 absorbs the HALO_IN=4 reflect
    pad and the t-2 window center). Returns (lo, hi) of shape (rows, wq2).

    Output block j (128 decimated columns) reads input lanes
    [256j + 2, 256j + 262) — inside the lane-aligned 3-block slice
    x[:, 256j : 256j + 384]; one (384, 256) LO|HI band matrix is shared by
    every block. Replaces the round-3a VPU formulation (4 `pltpu.roll`
    lane shuffles per stream at FULL lane width, decimation by masking)
    AND halves the lane width of every downstream decouple/CSF/masking/
    pooling VPU chain — the even-offset lanes were 50% dead work.
    The caller pads the input so the last slice stays in bounds (an
    in-kernel zero-block concat hits a Mosaic layout-offset limitation:
    the row-matmul slices carry a sublane offset the concat can't merge).
    """
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (384, 128), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (384, 128), 1)
    d = l_ids - (2 * c_ids + 2)

    def band(tp):
        m = None
        for t, wgt in enumerate(tp):
            term = jnp.where(d == t, float(wgt), 0.0)
            m = term if m is None else m + term
        return m

    m2 = jnp.concatenate([band(LO), band(HI)], axis=1)  # (384, 256)
    los, his = [], []
    for j in range(wq2 // 128):
        y = jnp.dot(
            x[:, 256 * j : 256 * j + 384], m2,
            preferred_element_type=jnp.float32, precision=FILTER_PRECISION,
        )
        los.append(y[:, :128])
        his.append(y[:, 128:])
    lo = los[0] if len(los) == 1 else jnp.concatenate(los, axis=1)
    hi = his[0] if len(his) == 1 else jnp.concatenate(his, axis=1)
    return lo, hi


def _adm0_dma_only_kernel(
    ref_hbm, dis_hbm, sums_ref, rbuf, dbuf, sem_r, sem_d,
    *, strip: int,
):
    """Profiling stage 0: the production kernel's double-buffered input DMA
    and the small sums write, WITHOUT the two (strip, wq2) output blocks —
    isolates the big-output VMEM->HBM write cost from the input path."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    n_s = pl.num_programs(1)
    rows_in = 2 * strip + 8
    k = i * n_s + s
    slot = jax.lax.rem(k, 2)

    def dma_pair(kk, sl):
        ii = kk // n_s
        ss = jax.lax.rem(kk, n_s)
        return (
            pltpu.make_async_copy(
                ref_hbm.at[ii, pl.ds(2 * ss * strip, rows_in), :],
                rbuf.at[sl], sem_r.at[sl],
            ),
            pltpu.make_async_copy(
                dis_hbm.at[ii, pl.ds(2 * ss * strip, rows_in), :],
                dbuf.at[sl], sem_d.at[sl],
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
        lane == 0, rbuf[slot][0, 0] + dbuf[slot][0, 0], 0.0
    )[0]


def _adm0_kernel(
    ref_hbm, dis_hbm, sums_ref, aref_out, adis_out,
    rbuf, dbuf, sem_r, sem_d,
    *, h2: int, w2: int, wq2: int, top: int, left: int,
    fh: float, fd: float, egl, strip: int, stages: int = 6,
):
    """Grid (B, n_strips). Strip s covers subband rows [s*strip, (s+1)*strip).

    The DMA'd input rows are the mirror-padded luma rows [2*s*strip,
    2*s*strip + ROWS); banded matrices map them to subband rows
    [s*strip - 1, s*strip + strip + 1) (one spread-halo row each side,
    edge-replicated at the image boundary via clamped row selection).
    """
    i = pl.program_id(0)
    s = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_s = pl.num_programs(1)
    rows_in = 2 * strip + 8
    rows_out = strip + 2
    g0 = s * strip

    # --- double-buffered input DMA (round 3d) -------------------------------
    # Cell k reads slot k%2, whose DMA was started by cell k-1 (cell 0
    # starts its own); before waiting, it starts cell k+1's DMA into the
    # other slot, so the next strip's HBM reads overlap this strip's
    # compute. The start/wait-in-cell form was DMA-serialization-bound:
    # strip-size doubling (25->16 cells) and lane-width halving (the round-3d
    # decimated column matmuls) were BOTH neutral at ~110 ms / 128x1080p —
    # the constant was total DMA bytes, not per-cell overhead or VPU width.
    k = i * n_s + s
    slot = jax.lax.rem(k, 2)

    def dma_pair(kk, sl):
        ii = kk // n_s
        ss = jax.lax.rem(kk, n_s)
        return (
            pltpu.make_async_copy(
                ref_hbm.at[ii, pl.ds(2 * ss * strip, rows_in), :],
                rbuf.at[sl], sem_r.at[sl],
            ),
            pltpu.make_async_copy(
                dis_hbm.at[ii, pl.ds(2 * ss * strip, rows_in), :],
                dbuf.at[sl], sem_d.at[sl],
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
        _early_exit(rbuf[slot], dbuf[slot], rbuf[slot][0, 0])
        return

    # --- banded row-filter + row-decimation matrices ------------------------
    # Output row r represents subband row g = g0 + r - 1 (r=0 and r=strip+1
    # are the spread halo). Window = input local rows [base, base+3] with
    # base = 2*(g_eff - g0) + 2, g_eff = clip(g, 0, h2-1) (edge replication
    # of the SUBBAND grid at the image boundary, matching the oracle's
    # np.pad(mode='edge') in the masking spread).
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_out, rows_in), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_out, rows_in), 1)
    g = g0 + r_ids - 1
    g_eff = jnp.clip(g, 0, h2 - 1)
    base = 2 * (g_eff - g0) + 2

    def band_matrix(taps):
        m = None
        for t, w in enumerate(taps):
            term = jnp.where(l_ids == base + t, float(w), 0.0)
            m = term if m is None else m + term
        return m

    # lo and hi row filters stacked into ONE matrix per stream: each matmul
    # is tiny (rows_out x rows_in, e.g. 34 x 72) so a 34-row M dimension
    # wastes 3/4 of the 128-wide systolic rows — stacking doubles MXU row
    # occupancy and halves the matmul dispatches. Each output row's
    # contraction is unchanged (equal to the separate dots to ~1e-6; the
    # stacked shape tiles the MXU differently).
    m_both = jnp.concatenate([band_matrix(LO), band_matrix(HI)], axis=0)

    def rows_fused(x):
        both = jnp.dot(
            m_both, x, preferred_element_type=jnp.float32,
            precision=FILTER_PRECISION,
        )
        rows_out = m_both.shape[0] // 2
        return both[:rows_out], both[rows_out:]

    lo_r, hi_r = rows_fused(rbuf[slot])
    lo_d, hi_d = rows_fused(dbuf[slot])

    if stages <= 2:
        _early_exit(lo_r, lo_d, hi_r[0, 0] + hi_d[0, 0])
        return

    # --- column filters + lane decimation (MXU banded matmuls) -------------
    oa, oh = _lane_filt_decim(lo_r, wq2)
    ov, od = _lane_filt_decim(hi_r, wq2)
    ta, th = _lane_filt_decim(lo_d, wq2)
    tv, td = _lane_filt_decim(hi_d, wq2)

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
    # Lanes ARE decimated columns now; neighbors are +-1, edge-replicated at
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

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    packed = jnp.zeros((1, 128), jnp.float32)
    for idx, val in enumerate((nh, dh, nv, dv, nd, dd)):
        packed = jnp.where(lane == idx, val, packed)
    sums_ref[0, s, :] = packed[0]

    # --- approximation bands for scales 1-3 ---------------------------------
    aref_out[0, :, :] = oa[1 : strip + 1]
    adis_out[0, :, :] = ta[1 : strip + 1]


@functools.partial(
    jax.jit, static_argnames=("scale", "egl", "interpret", "stages")
)
def adm_scale_pallas(
    ref_y: jnp.ndarray, dis_y: jnp.ndarray, scale: int = 0,
    egl=None, interpret: bool = False, stages: int = 6,
):
    """Fused ADM at one scale over (B, H, W) luma (the scale's approximation
    band — the original luma at scale 0).

    The db2 DWT taps are scale-invariant; only the Watson CSF weights and
    the input size change per level, so one kernel serves all four scales.
    Returns (num (B,), den (B,), a_ref (B, H2, W2), a_dis (B, H2, W2)):
    this scale's pooling contributions (offsets included) and the next
    scale's inputs.
    """
    b, h, w = ref_y.shape
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    # Adaptive strip (round 3, as in vif_pallas): VMEM scales with strip x
    # padded width — NARROW deeper scales afford taller strips (1080p:
    # 17/9/5/3 cells per frame drop to 17/5/2/1). Doubling strips again
    # (9/3/2/2 cells) was measured NEUTRAL on the v5e (131 vs 125 ms for
    # 128x1080p all-scales): the kernel is compute/DMA-bound, not
    # per-cell-overhead-bound — don't re-derive this.
    if w >= 1536:
        strip = STRIP
    elif w >= 640:
        strip = 2 * STRIP
    else:
        strip = 4 * STRIP
    while strip > 16 and strip - h2 >= 16:
        strip //= 2
    n_strips = -(-h2 // strip)
    wq2 = 128 * (-(-w2 // 128))  # decimated lane width (output blocks)
    # The last 384-wide column-filter slice reads up to lane
    # 256*(wq2/128 - 1) + 384 — pad the input that wide (edge mode; the
    # extra lanes only feed masked-out output columns). At 1080p this is
    # 2176 vs 2048 (+6% DMA; an in-VMEM zero extension instead trips a
    # Mosaic concat layout-offset limitation).
    wq = max(_round_up(w + 2 * HALO_IN, 128), 256 * (wq2 // 128 - 1) + 384)
    rows_in = 2 * strip + 8
    pad_h_target = 2 * strip * n_strips + 8

    def prep(x):
        x = x.astype(jnp.float32)
        x = jnp.pad(x, ((0, 0), (0, 0), (HALO_IN, HALO_IN)), mode="reflect")
        x = jnp.pad(x, ((0, 0), (HALO_IN, HALO_IN), (0, 0)), mode="reflect")
        return jnp.pad(
            x,
            ((0, 0), (0, pad_h_target - (h + 2 * HALO_IN)), (0, wq - w - 2 * HALO_IN)),
            mode="edge",
        )

    ys, xs = _center_crop_slices(h2, w2)
    top, left = ys.start, xs.start
    area = (ys.stop - ys.start) * (xs.stop - xs.start)
    offset = (area / 32.0) ** (1.0 / 3.0)
    fh, _, fd = csf_rfactors(scale)  # fh == fv at every scale

    if stages == 0:
        # Profiling: input path + sums only (see _adm0_dma_only_kernel).
        sums = pl.pallas_call(
            functools.partial(_adm0_dma_only_kernel, strip=strip),
            out_shape=jax.ShapeDtypeStruct((b, n_strips, 128), jnp.float32),
            grid=(b, n_strips),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, n_strips, 128), lambda i, s: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, rows_in, wq), jnp.float32),
                pltpu.VMEM((2, rows_in, wq), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(prep(ref_y), prep(dis_y))
        z = jnp.zeros((b, h2, w2), jnp.float32)
        return jnp.sum(sums[..., 0], axis=-1), jnp.sum(sums[..., 1], -1), z, z

    sums, a_ref, a_dis = pl.pallas_call(
        functools.partial(
            _adm0_kernel,
            h2=h2, w2=w2, wq2=wq2, top=top, left=left,
            fh=float(fh), fd=float(fd), egl=egl, strip=strip, stages=stages,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_strips, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, n_strips * strip, wq2), jnp.float32),
            jax.ShapeDtypeStruct((b, n_strips * strip, wq2), jnp.float32),
        ),
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, n_strips, 128), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, strip, wq2), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, strip, wq2), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows_in, wq), jnp.float32),
            pltpu.VMEM((2, rows_in, wq), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(prep(ref_y), prep(dis_y))

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
    # Kernel lanes ARE the decimated grid now — just crop the block padding.
    ar = a_ref[:, :h2, :w2]
    ad = a_dis[:, :h2, :w2]
    return num0, den0, ar, ad


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
    ``vmaf.adm.adm_features``."""
    interpret = jax.default_backend() == "cpu"
    num = den = 0.0
    o, t = ref_y, dis_y
    for scale in range(4):
        n_s, d_s, o, t = adm_scale_pallas(
            o, t, scale, egl=enhn_gain_limit, interpret=interpret
        )
        num = num + n_s
        den = den + d_s
    return {"adm2": adm_finalize(num, den, ref_y.shape)}
