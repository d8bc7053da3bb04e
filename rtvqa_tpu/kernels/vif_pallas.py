"""Pallas TPU kernel: fused VIF scale-0 statistics + next-scale decimation.

VIF's scale 0 dominates the quality phase: five 17-tap separable moment
filters over full-resolution luma (mu1, mu2, E[r^2], E[d^2], E[rd]) plus the
per-pixel information-fidelity statistics, and then a SEPARATE 9-tap filter +
decimation producing scale 1's inputs. In XLA each filter materializes
full-resolution intermediates in HBM; this kernel keeps everything in VMEM
row strips and writes only:

* the per-strip partial sums of VIF's num/den (two scalars per strip);
* the 9-tap-filtered, 2x-decimated ref/dis for scale 1 (quarter-size).

HBM traffic per frame drops from ~30 full-res arrays to 2 reads + 2
quarter-size writes.

Dataflow per strip (round-2 MXU restructure): every scale (the kernel is
generic over the 17/9/5/3-tap scale filters) runs BOTH separable filter
passes on the MXU as banded matmuls — the LANE pass as lane-aligned 128-wide
tiles against one shared (384, 128) band matrix (``_filt_lanes_mxu``), the
SUBLANE pass as one block-diagonal banded matmul over the five moment inputs
stacked along sublanes (which also restricts statistics to the strip's valid
rows). The next scale's pre-decimation filter fuses its 2x row decimation
into its own band matrix. The original VPU formulation (85 `pltpu.roll`s
per pass) was roll-overhead-bound at ~1.2 ms/frame.

Layout rules honored (see CLAUDE.md): no lane-splitting reshapes (lane
decimation uses a 0/1 selection matmul on the MXU), lane-aligned slices and
output blocks, DMA row slices padded to the sublane tiling.

Border handling matches `vmaf.filters` (scipy-'mirror' reflection): the host
wrapper reflect-pads by the filter half-width on both axes, so in-kernel
windows never cross an image edge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtvqa_tpu.vmaf.filters import gaussian_kernel

_SIGMA_NSQ = 2.0
_EPS = 1e-10

# Precision of the banded FILTER matmuls (Gaussian moment windows, the
# pre-decimation filters, ADM's db2 bands). HIGHEST = 6-pass bf16 on the MXU
# (f32-exact) is the default. DEFAULT (1-pass bf16) is too coarse for the
# VIF statistics' mu^2 cancellation (measured unusable), and Mosaic's dot
# lowering does NOT implement Precision.HIGH (3-pass) — so the fast-math
# mode here is FAST3: a MANUAL 3-pass scheme splitting each operand into
# hi + lo bf16 parts and dropping only the lo*lo cross term (one tripled-
# contraction native-bf16 matmul, ~2x MXU throughput vs HIGHEST; relative
# filter error ~2^-17 per tap — see scripts/precision_ab.py for the
# measured end-to-end feature error). The SSIM pooling matmuls in
# kernels.quality_pallas always stay HIGHEST (their integer exactness is a
# correctness guarantee).
import os as _os

_ENV_PREC = _os.environ.get("RTVQA_FILTER_PRECISION")
_prec_name = (_ENV_PREC or "HIGHEST").upper()
if _prec_name not in ("DEFAULT", "HIGHEST", "FAST3"):
    _prec_name = "HIGHEST"
FILTER_FAST3 = _prec_name == "FAST3"
FILTER_PRECISION = getattr(
    jax.lax.Precision, "HIGHEST" if FILTER_FAST3 else _prec_name
)


def resolve_fast3(fast3):
    """Resolve a caller's fast3 request (None = auto policy).

    Auto: FAST3 on the TPU (measured end-to-end VIF feature error <= ~5e-4
    with the scale<=1 gating — far inside libvmaf's own float-vs-integer
    path divergence and the 0.1 VMAF score budget; see docs/PARITY.md),
    exact on CPU (tests/oracles). An explicit RTVQA_FILTER_PRECISION env
    value overrides the auto policy in both directions; an explicit
    True/False from the caller (config ``quality_precision``) wins outright.
    """
    if fast3 is not None:
        return bool(fast3)
    if _ENV_PREC is not None:
        return FILTER_FAST3
    return jax.default_backend() != "cpu"

TAPS17 = gaussian_kernel(17, 17 / 5.0).astype(np.float32)
TAPS9 = gaussian_kernel(9, 9 / 5.0).astype(np.float32)
HALO = 8  # max filter half-width (17-tap)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _split_taps(taps):
    """Split filter taps into (hi, lo) with hi exactly bf16-representable and
    hi + lo == tap to f32 precision (lo is bf16-rounded once more inside the
    kernel — a second-order error)."""
    import ml_dtypes

    t = np.asarray(taps, np.float32)
    hi = t.astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = t - hi
    return tuple(float(v) for v in hi), tuple(float(v) for v in lo)


def _split_bf16(x):
    """x (f32) ~= hi + lo with both parts bf16 (error ~2^-16 |x|)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _filt_lanes_mxu(x2, taps, off, wq, fast3=FILTER_FAST3):
    """Lane-axis FIR filter as tiled banded matmuls on the MXU.

    ``x2`` is the input with a 128-lane zero block prepended (data for padded
    lane j lives at x2 lane 128 + j), width 128 + wq + 128. Output lane
    j = 128*b + jj (j in [0, wq)) needs input lanes [j + off, j + off + k) =
    x2 lanes [128*(b+1) + jj + off, ...), all inside the lane-aligned 2-block
    slice x2[:, 128*(b+1) : 128*(b+1) + 256] (jj + off + k - 1 <= 127 + 2 *
    halo <= 143 < 256). One (256, 128) band matrix shared by every block; 17
    VPU rolls over the full array become wq/128 tiny MXU matmuls (~5x less
    VPU work — the rolls dominated the kernel, measured 1.2 ms/frame at
    1080p). Round 3: the slices were (384, 128) 3-block windows whose first
    block was structurally unused — 2-block slices cut the lane-pass MXU
    FLOPs by a third with identical arithmetic.
    """
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
    dlane = l_ids - (j_ids + off)

    def band(tp):
        m = None
        for t, wgt in enumerate(tp):
            term = jnp.where(dlane == t, float(wgt), 0.0)
            m = term if m is None else m + term
        return m

    if fast3:
        # Manual 3-pass bf16: x @ m ~= xh@mh + xh@ml + xl@mh as ONE
        # tripled-contraction native-bf16 matmul (lo*lo dropped).
        th, tl = _split_taps(taps)
        m3 = jnp.concatenate(
            [band(th).astype(jnp.bfloat16), band(tl).astype(jnp.bfloat16),
             band(th).astype(jnp.bfloat16)], axis=0
        )
        xh, xl = _split_bf16(x2)
        blocks = []
        for b in range(wq // 128):
            lo_, hi_ = 128 * (b + 1), 128 * (b + 1) + 256
            sl3 = jnp.concatenate(
                [xh[:, lo_:hi_], xh[:, lo_:hi_], xl[:, lo_:hi_]], axis=1
            )
            blocks.append(
                jnp.dot(sl3, m3, preferred_element_type=jnp.float32)
            )
        return jnp.concatenate(blocks, axis=1)

    m = band(taps)
    blocks = []
    for b in range(wq // 128):
        sl = x2[:, 128 * (b + 1) : 128 * (b + 1) + 256]
        blocks.append(
            jnp.dot(
                sl, m,
                preferred_element_type=jnp.float32,
                precision=FILTER_PRECISION,
            )
        )
    return jnp.concatenate(blocks, axis=1)


def _filt_rows_mxu(lane_f, taps, n_seg, seg_out, seg_in, stride, off_row,
                   fast3=FILTER_FAST3):
    """Sublane-axis FIR (optionally fused with row decimation) as per-segment
    banded matmuls on the MXU.

    ``lane_f`` stacks ``n_seg`` equal segments of ``seg_in`` sublanes; output
    row x of segment m is sum_t taps[t] * lane_f[m * seg_in + stride * x +
    off_row + t]. Returns the (n_seg * seg_out, lanes) stacked outputs.

    Round 3: this replaces a single block-diagonal (n_seg * seg_out,
    n_seg * seg_in) banded matmul — the off-diagonal blocks were structural
    zeros, so per-segment (seg_out, seg_in) dots cut the sublane-pass MXU
    FLOPs n_seg-fold with identical arithmetic (the band is the same for
    every segment).
    """
    o_ids = jax.lax.broadcasted_iota(jnp.int32, (seg_out, seg_in), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (seg_out, seg_in), 1)
    d = l_ids - (stride * o_ids + off_row)

    def mk_band(tp):
        band = None
        for t, wgt in enumerate(tp):
            term = jnp.where(d == t, float(wgt), 0.0)
            band = term if band is None else band + term
        return band

    if fast3:
        th, tl = _split_taps(taps)
        band3 = jnp.concatenate(
            [mk_band(th).astype(jnp.bfloat16), mk_band(tl).astype(jnp.bfloat16),
             mk_band(th).astype(jnp.bfloat16)], axis=1
        )
        lfh, lfl = _split_bf16(lane_f)
        outs = [
            jnp.dot(
                band3,
                jnp.concatenate(
                    [lfh[m * seg_in : (m + 1) * seg_in],
                     lfh[m * seg_in : (m + 1) * seg_in],
                     lfl[m * seg_in : (m + 1) * seg_in]], axis=0
                ),
                preferred_element_type=jnp.float32,
            )
            for m in range(n_seg)
        ]
        return jnp.concatenate(outs, axis=0)

    band = mk_band(taps)
    outs = [
        jnp.dot(
            band, lane_f[m * seg_in : (m + 1) * seg_in],
            preferred_element_type=jnp.float32,
            precision=FILTER_PRECISION,
        )
        for m in range(n_seg)
    ]
    return jnp.concatenate(outs, axis=0)


def _vif_scale_kernel(
    ref_hbm, dis_hbm, *refs,
    strip: int, h: int, w: int, wq: int,
    taps_stats, taps_dec, halo: int, egl=None, fast3: bool = False,
):
    """Grid (B, n_strips). Strip s covers output rows [s*strip, (s+1)*strip).

    Generic over the VIF scale: ``taps_stats`` is the scale's Gaussian
    moment-filter (17/9/5/3 taps for scales 0-3), ``taps_dec`` the NEXT
    scale's pre-decimation filter (or None at the last scale, which then
    emits no decimated outputs), ``halo`` = len(taps_stats)//2.

    Inputs are reflect-padded on the host: lanes by ``halo``, rows by
    ``halo_pad = round_up(halo, 4)`` (Mosaic requires DMA row slices aligned
    to the sublane tiling of 8; strip is a multiple of 8, so the row halo is
    rounded so ``rows = strip + 2*halo_pad`` stays aligned — the extra
    ``halo_pad - halo`` rows are reflect fill the band matrices simply skip).
    Padded row r corresponds to original row r - halo_pad; the strip needs
    padded rows [s*strip, s*strip + rows). When H is not a multiple of the
    strip size (e.g. 1080 = 67*16 + 8), the host edge-pads the bottom and the
    last strip masks its num/den sums to the ``h - s*strip`` valid rows.
    """
    if taps_dec is not None:
        out_nd_ref, dec_ref_out, dec_dis_out, rbuf, dbuf, sem_r, sem_d = refs
    else:
        out_nd_ref, rbuf, dbuf, sem_r, sem_d = refs
    i = pl.program_id(0)
    s = pl.program_id(1)
    halo_pad = _round_up(halo, 4)
    row_off = halo_pad - halo  # first row of an output-row window
    rows = strip + 2 * halo_pad

    dma_r = pltpu.make_async_copy(
        ref_hbm.at[i, pl.ds(s * strip, rows), :], rbuf, sem_r
    )
    dma_d = pltpu.make_async_copy(
        dis_hbm.at[i, pl.ds(s * strip, rows), :], dbuf, sem_d
    )
    dma_r.start()
    dma_d.start()
    dma_r.wait()
    dma_d.wait()

    r = rbuf[...]
    d = dbuf[...]

    # --- separable moment filters ------------------------------------------
    # Lane pass: after it, lane j holds the filtered value centered at
    # original column j (window [j-halo, j+halo] in padded coords
    # [j, j+2*halo]). The five moment inputs are STACKED along sublanes so
    # the k `pltpu.roll`s run once over a (5*rows, wq) array instead of 5k
    # rolls over five (rows, wq) arrays (VPU work is the same per element,
    # but per-op roll overhead dominates at this size — measured ~35% kernel
    # time). Sublane pass: ONE block-diagonal banded matmul on the MXU
    # replaces the 5k sublane rolls AND restricts output to the strip's
    # valid rows (the roll version computed statistics on all `rows`
    # sublanes and masked half of them away).
    stacked = jnp.concatenate([r, d, r * r, d * d, r * d], axis=0)
    lane_f = _filt_lanes_mxu(stacked, taps_stats, 0, wq, fast3)

    # Output row x of moment m takes the k-tap window starting at row
    # x + row_off of its own stacked segment (row_off skips the
    # sublane-alignment fill rows).
    mom = _filt_rows_mxu(lane_f, taps_stats, 5, strip, rows, 1, row_off, fast3)
    mu1 = mom[0:strip]
    mu2 = mom[strip : 2 * strip]
    s11 = mom[2 * strip : 3 * strip]
    s22 = mom[3 * strip : 4 * strip]
    s12 = mom[4 * strip : 5 * strip]

    sigma1 = jnp.maximum(s11 - mu1 * mu1, 0.0)
    sigma2 = jnp.maximum(s22 - mu2 * mu2, 0.0)
    sigma12 = s12 - mu1 * mu2

    g = sigma12 / (sigma1 + _EPS)
    sv = sigma2 - g * sigma12
    small1 = sigma1 < _EPS
    g = jnp.where(small1, 0.0, g)
    sv = jnp.where(small1, sigma2, sv)
    sigma1 = jnp.where(small1, 0.0, sigma1)
    small2 = sigma2 < _EPS
    g = jnp.where(small2, 0.0, g)
    sv = jnp.where(small2, 0.0, sv)
    neg = g < 0
    sv = jnp.where(neg, sigma2, sv)
    g = jnp.where(neg, 0.0, g)
    sv = jnp.maximum(sv, _EPS)
    if egl is not None:
        # NEG mode (libvmaf vif_enhn_gain_limit, e.g. vmaf_v0.6.1neg): cap
        # the regression gain AFTER the stability clamps, exactly as
        # vmaf.vif._vif_scale_stats does — keeps NEG models on the fused
        # Pallas path (ADVICE r2 #1).
        g = jnp.minimum(g, float(egl))

    num = jnp.log2(1.0 + g * g * sigma1 / (sv + _SIGMA_NSQ))
    den = jnp.log2(1.0 + sigma1 / _SIGMA_NSQ)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (strip, wq), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (strip, wq), 1)
    strip_valid = jnp.minimum(strip, h - s * strip)  # ragged last strip
    valid = (row_ids < strip_valid) & (col_ids < w)
    num_sum = jnp.sum(jnp.where(valid, num, 0.0))
    den_sum = jnp.sum(jnp.where(valid, den, 0.0))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    packed = jnp.where(lane == 0, num_sum, jnp.where(lane == 1, den_sum, 0.0))
    out_nd_ref[0, s, :] = packed[0]

    # --- next-scale filter + 2x decimation ---------------------------------
    if taps_dec is None:
        return
    # The dec window center must align with the padding: original column j
    # sits at padded lane j + halo (row r at padded row r + halo_pad), so
    # shift the tap start accordingly per axis.
    off = halo - len(taps_dec) // 2
    off_row = halo_pad - len(taps_dec) // 2

    # Lane pass over both streams stacked, then ONE banded matmul that fuses
    # the sublane filter WITH the 2x row decimation: decimated output row rr
    # of stream m reads its stacked segment's padded rows
    # [2*rr + off, 2*rr + off + k). LANE decimation happens OUTSIDE the
    # kernel (filters.even_lanes, one MXU matmul on the half-height array):
    # an in-kernel (wq, wd) lane-selection matrix costs 8 MB of VMEM at
    # 1080p and blew the 16 MB scoped budget.
    rd_stack = jnp.concatenate([r, d], axis=0)
    lane9 = _filt_lanes_mxu(rd_stack, taps_dec, off, wq, fast3)

    half = strip // 2
    dec = _filt_rows_mxu(lane9, taps_dec, 2, half, rows, 2, off_row, fast3)
    dec_ref_out[0, :, :] = dec[0:half]
    dec_dis_out[0, :, :] = dec[half : 2 * half]


@functools.partial(
    jax.jit, static_argnames=("scale", "egl", "interpret", "fast3")
)
def vif_scale_pallas(
    ref_y: jnp.ndarray, dis_y: jnp.ndarray, scale: int, egl=None,
    interpret: bool = False, fast3=None,
):
    """Fused VIF at one scale over (B, H, W) float/uint8 luma.

    For scales 0-2 returns (vif_scale (B,), dec_ref (B, H/2, W/2),
    dec_dis (B, H/2, W/2)) — the per-frame feature plus the NEXT scale's
    inputs (filtered with the next scale's Gaussian and decimated, identical
    to `vmaf.filters` semantics). For scale 3 returns (vif_scale3, None,
    None).

    H and W arbitrary (H >= len(taps) for the reflect halo); a ragged final
    row strip is masked in-kernel and its decimated tail sliced off.

    ``fast3`` (None = auto, see ``resolve_fast3``) selects the manual 3-pass
    bf16 filter matmuls — applied at scales <= 1 ONLY: scale 0 holds >90% of
    the filter FLOPs and its per-scale feature error is ~2e-4, but letting
    the error compound through all three decimation stages reaches ~4e-3 at
    scale 3 (measured on-device); scales 2-3 frames are 16-64x smaller, so
    running them exact costs ~nothing and caps the end-to-end error at the
    scale-1 level (~5e-4).
    """
    b, h, w = ref_y.shape
    f3 = resolve_fast3(fast3) and scale <= 1
    # Grid-cell count is the kernel's dominant cost (~15 us of Mosaic grid +
    # DMA-issue overhead per cell; the filter math itself runs on the MXU
    # and is nearly free) — use the largest strip VMEM affords. The VMEM
    # footprint scales with strip x padded-width, so NARROW frames (VIF
    # scales 1-3: 960/480/240 wide at 1080p) afford proportionally taller
    # strips: 540 rows drop from 17 cells to 9, 270 from 9 to 3, 135 from
    # 5 to 2 (round 3, VERDICT r2 next #3).
    if w >= 1536:
        strip = 32
    elif w >= 640:
        strip = 64
    else:
        strip = 128
    while strip > 16 and strip - h >= 16:
        strip //= 2  # don't overshoot short frames (strip stays mult of 8)
    n_stats = 2 ** (4 - scale) + 1
    halo = n_stats // 2
    taps_stats = tuple(float(v) for v in gaussian_kernel(n_stats, n_stats / 5.0))
    if scale < 3:
        n_dec = 2 ** (3 - scale) + 1
        taps_dec = tuple(float(v) for v in gaussian_kernel(n_dec, n_dec / 5.0))
    else:
        taps_dec = None
    ref = ref_y.astype(jnp.float32)
    dis = dis_y.astype(jnp.float32)

    n_strips = -(-h // strip)  # ceil: last strip ragged when h % 16 != 0
    h_pad = n_strips * strip
    halo_pad = _round_up(halo, 4)  # sublane-aligned DMA row slices
    wq = _round_up(w + 2 * halo, 128)
    pad_rows = ((0, 0), (halo_pad, halo_pad), (0, 0))
    pad_cols_reflect = ((0, 0), (0, 0), (halo, halo))

    def prep(x):
        x = jnp.pad(x, pad_cols_reflect, mode="reflect")
        x = jnp.pad(x, pad_rows, mode="reflect")
        # Bottom edge-fill for the ragged strip (consumed only by masked-out
        # rows) + lane round-up.
        x = jnp.pad(
            x, ((0, 0), (0, h_pad - h), (0, wq - w - 2 * halo)), mode="edge"
        )
        # One extra 128-lane block on each side for the MXU lane filter's
        # lane-aligned 3-block slices (see _filt_lanes_mxu).
        return jnp.pad(x, ((0, 0), (0, 0), (128, 128)))

    ref_p = prep(ref)
    dis_p = prep(dis)

    rows = strip + 2 * halo_pad
    nd_shape = jax.ShapeDtypeStruct((b, n_strips, 128), jnp.float32)
    nd_spec = pl.BlockSpec(
        (1, n_strips, 128), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dec_shape = jax.ShapeDtypeStruct((b, n_strips * strip // 2, wq), jnp.float32)
    dec_spec = pl.BlockSpec(
        (1, strip // 2, wq), lambda i, s: (i, s, 0), memory_space=pltpu.VMEM
    )

    outs = pl.pallas_call(
        functools.partial(
            _vif_scale_kernel, strip=strip, h=h, w=w, wq=wq,
            taps_stats=taps_stats, taps_dec=taps_dec, halo=halo, egl=egl,
            fast3=f3,
        ),
        out_shape=(nd_shape, dec_shape, dec_shape) if taps_dec else (nd_shape,),
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(nd_spec, dec_spec, dec_spec) if taps_dec else (nd_spec,),
        scratch_shapes=[
            pltpu.VMEM((rows, wq + 256), jnp.float32),
            pltpu.VMEM((rows, wq + 256), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(ref_p, dis_p)

    out_nd = outs[0]
    num = jnp.sum(out_nd[..., 0], axis=-1)
    den = jnp.sum(out_nd[..., 1], axis=-1)
    vif = num / jnp.maximum(den, _EPS)
    if taps_dec is None:
        return vif, None, None
    # Kernel outputs are row-decimated, full padded width; finish with the
    # lane decimation (one MXU selection matmul on the half-height array).
    hd = (h + 1) // 2  # decimate2 keeps even indices
    from rtvqa_tpu.vmaf.filters import even_lanes

    dr = even_lanes(outs[1][:, :hd, :w])
    dd = even_lanes(outs[2][:, :hd, :w])
    return vif, dr, dd


def vif_scale0_pallas(ref_y: jnp.ndarray, dis_y: jnp.ndarray, interpret: bool = False):
    """Fused VIF scale 0 (see ``vif_scale_pallas``)."""
    return vif_scale_pallas(ref_y, dis_y, 0, interpret=interpret)


def vif_features_pallas(
    ref_y: jnp.ndarray, dis_y: jnp.ndarray, enhn_gain_limit=None, fast3=None
) -> dict[str, jnp.ndarray]:
    """VIF at 4 scales, every scale as the fused Pallas kernel (the XLA
    slice-chain filters at scales 1-3 cost ~2x the scale-0 kernel in HBM
    traffic despite the smaller frames). Matches `vmaf.vif.vif_features`,
    including NEG mode (``enhn_gain_limit``); ``fast3`` as in
    ``vif_scale_pallas`` (scale <= 1 gating applied per scale)."""
    interpret = jax.default_backend() == "cpu"
    egl = None if enhn_gain_limit is None else float(enhn_gain_limit)
    out = {}
    ref, dis = ref_y, dis_y
    for scale in range(4):
        v, ref, dis = vif_scale_pallas(
            ref, dis, scale, egl=egl, interpret=interpret, fast3=fast3
        )
        out[f"vif_scale{scale}"] = v
    return out
