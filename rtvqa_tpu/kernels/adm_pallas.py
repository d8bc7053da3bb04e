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
2. db2 column filters as 4-tap `pltpu.roll` lane convolutions evaluated at
   every lane; only even-offset lanes carry decimated-grid values (lane
   decimation by masking — a lane-selection matmul in VMEM is an 8 MB
   constant at 1080p and blew the scoped budget in the VIF kernel);
3. decoupling (cos 1 deg test, optional NEG gain cap), Watson CSF weighting,
   the 3x3 contrast-masking spread (sublane static slices x lane +-2 rolls
   with edge-replication masks), and the center-crop-masked cube-power sums.

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


def _lane_conv4_pair(x, taps_a, taps_b, wq):
    """(val_a[l], val_b[l]) with val[l] = sum_t taps[t] * x[l + t - 2] — the
    db2 lo AND hi column filters of one input share their four lane rolls
    (each roll is a VPU lane shuffle over the whole strip; the kernel always
    needs both subbands of every row-filtered stream, so pairing halves the
    roll count from 32 to 16 per strip). Tap accumulation order is unchanged.
    In-session A/B at 128x1080p (all four scales, with the stacked row
    matmul below): 105.3 vs 106.1 ms median — NEUTRAL, consistent with the
    kernel being VPU-compute/DMA-bound (Mosaic likely CSE'd the duplicate
    rolls already); kept as the cheaper form. adm2 diff vs the old kernel
    1.07e-6 (MXU tiling of the stacked matmul)."""
    acc_a = acc_b = None
    for t in range(4):
        sh = (wq + 2 - t) % wq
        xr = pltpu.roll(x, sh, axis=1) if sh else x
        ta = float(taps_a[t]) * xr
        tb = float(taps_b[t]) * xr
        acc_a = ta if acc_a is None else acc_a + ta
        acc_b = tb if acc_b is None else acc_b + tb
    return acc_a, acc_b


def _adm0_kernel(
    ref_hbm, dis_hbm, sums_ref, aref_out, adis_out,
    rbuf, dbuf, sem_r, sem_d,
    *, h2: int, w2: int, wq: int, top: int, left: int,
    fh: float, fd: float, egl, strip: int,
):
    """Grid (B, n_strips). Strip s covers subband rows [s*strip, (s+1)*strip).

    The DMA'd input rows are the mirror-padded luma rows [2*s*strip,
    2*s*strip + ROWS); banded matrices map them to subband rows
    [s*strip - 1, s*strip + strip + 1) (one spread-halo row each side,
    edge-replicated at the image boundary via clamped row selection).
    """
    i = pl.program_id(0)
    s = pl.program_id(1)
    rows_in = 2 * strip + 8
    rows_out = strip + 2
    g0 = s * strip

    dma_r = pltpu.make_async_copy(
        ref_hbm.at[i, pl.ds(2 * g0, rows_in), :], rbuf, sem_r
    )
    dma_d = pltpu.make_async_copy(
        dis_hbm.at[i, pl.ds(2 * g0, rows_in), :], dbuf, sem_d
    )
    dma_r.start()
    dma_d.start()
    dma_r.wait()
    dma_d.wait()

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

    lo_r, hi_r = rows_fused(rbuf[...])
    lo_d, hi_d = rows_fused(dbuf[...])

    # --- column filters (even-offset lanes = decimated grid) ---------------
    oa, oh = _lane_conv4_pair(lo_r, LO, HI, wq)
    ov, od = _lane_conv4_pair(hi_r, LO, HI, wq)
    ta, th = _lane_conv4_pair(lo_d, LO, HI, wq)
    tv, td = _lane_conv4_pair(hi_d, LO, HI, wq)

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

    # --- 3x3 masking spread (center weight 2, /30) --------------------------
    # Lane neighbors are +-2 (adjacent decimated columns); at the image's
    # left/right boundary the neighbor is the edge column itself.
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_out, wq), 1)
    left_n = jnp.where(
        lane_ids == HALO_IN, spread_in, pltpu.roll(spread_in, 2, axis=1)
    )
    right_n = jnp.where(
        lane_ids == HALO_IN + 2 * (w2 - 1), spread_in,
        pltpu.roll(spread_in, wq - 2, axis=1),
    )
    rowsum = left_n + spread_in + right_n
    thr = (
        rowsum[0:strip] + rowsum[1 : strip + 1] + rowsum[2 : strip + 2]
        + spread_in[1 : strip + 1]
    ) / 30.0

    # --- center-crop-masked L3 pooling partial sums -------------------------
    out_rows = jax.lax.broadcasted_iota(jnp.int32, (strip, wq), 0) + g0
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (strip, wq), 1)
    j = (out_lanes - HALO_IN) // 2  # decimated column index at even offsets
    on_grid = (out_lanes >= HALO_IN) & ((out_lanes - HALO_IN) % 2 == 0)
    valid = (
        on_grid
        & (out_rows >= top) & (out_rows < h2 - top)
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


@functools.partial(jax.jit, static_argnames=("scale", "egl", "interpret"))
def adm_scale_pallas(
    ref_y: jnp.ndarray, dis_y: jnp.ndarray, scale: int = 0,
    egl=None, interpret: bool = False,
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
    wq = _round_up(w + 2 * HALO_IN, 128)
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

    sums, a_ref, a_dis = pl.pallas_call(
        functools.partial(
            _adm0_kernel,
            h2=h2, w2=w2, wq=wq, top=top, left=left,
            fh=float(fh), fd=float(fd), egl=egl, strip=strip,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_strips, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, n_strips * strip, wq), jnp.float32),
            jax.ShapeDtypeStruct((b, n_strips * strip, wq), jnp.float32),
        ),
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, n_strips, 128), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, strip, wq), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, strip, wq), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_in, wq), jnp.float32),
            pltpu.VMEM((rows_in, wq), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
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
    from rtvqa_tpu.vmaf.filters import even_lanes

    ar = even_lanes(a_ref[:, :h2, HALO_IN : HALO_IN + w])
    ad = even_lanes(a_dis[:, :h2, HALO_IN : HALO_IN + w])
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
