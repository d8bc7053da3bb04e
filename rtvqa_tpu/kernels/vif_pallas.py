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

Dataflow per strip: every scale (the kernel is generic over the 17/9/5/3-tap
scale filters) runs BOTH separable filter passes on the MXU as banded
matmuls — the LANE pass as lane-aligned tiles against per-block band
matrices (one shared interior matrix; edge blocks encode the reflect
border — ``_lane_band_raw``), the SUBLANE pass as per-segment banded
matmuls over the five moment inputs stacked along sublanes (which also
restricts statistics to the strip's valid rows). The next scale's
pre-decimation filter fuses BOTH its 2x decimations into its bands
(stride-2 lane bands + stride-2 row bands), so the kernel writes half-size
dec outputs directly. The original VPU formulation (85 `pltpu.roll`s per
pass) was roll-overhead-bound at ~1.2 ms/frame.

Round 3e: the kernel reads the RAW (unpadded) arrays — border handling
(`vmaf.filters` scipy-'mirror' reflection) lives entirely in the band
matrices and 8-aligned clamped DMA windows. The previous host-side
reflect-pad prep (a chain of XLA jnp.pad copies) measured ~30 ms per kernel
per 128x1080p chunk — the single largest cost in the quality phase (see
scripts/probe_adm_stages.py for the bisection methodology).

Layout rules honored (see CLAUDE.md): no lane-splitting reshapes (lane
decimation folds into 0/1-banded selection matmuls on the MXU),
lane-aligned slices and output blocks, 8-aligned dynamic DMA row offsets
(multiply-last so Mosaic can prove divisibility).
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


def _lane_plan_raw(w: int, w_arr: int, n_blocks: int, stride: int, halo: int):
    """Static per-block (slice start, slice width, pure?) plan for the
    raw-input lane filter. Output block b holds output lanes
    [128b, 128(b+1)); output lane j contracts raw lanes
    [stride*j - halo, stride*j + halo]. Interior blocks share ONE band
    matrix (slice start stride*128b - 128); first/last blocks get bands
    encoding the reflect border / slice clamp."""
    sw = min(512 if stride == 2 else 384, w_arr)
    plan = []
    for b in range(n_blocks):
        a = 0 if b == 0 else stride * 128 * b - 128
        if a + sw > w_arr:
            a = w_arr - sw
        lo_q = stride * 128 * b - halo
        hi_q = stride * (128 * b + 127) + halo
        pure = (
            b > 0 and a == stride * 128 * b - 128
            and lo_q >= 0 and hi_q <= w - 1 and hi_q - a < sw
        )
        plan.append((a, sw, pure))
    return plan


def _lane_band_raw(b: int, a: int, sw: int, stride: int, halo: int,
                   w: int, pure: bool):
    """Returns a builder tp -> (sw, 128) band matrix for raw-input lane
    filtering: output lane j' + 128b contracts raw lanes
    stride*(j' + 128b) + t - halo (t over the taps), reflected at both
    image borders (np.pad 'reflect') and clipped for garbage output lanes
    beyond the valid width."""
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, 128), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, 128), 1)

    def band(tp):
        m = None
        for t, wgt in enumerate(tp):
            if pure:
                hit = l_ids == stride * j_ids + 128 + t - halo
            else:
                q = stride * (j_ids + 128 * b) + t - halo
                q = jnp.abs(q)
                q = jnp.where(q >= w, jnp.clip(2 * (w - 1) - q, 0, w - 1), q)
                l_t = q - a
                hit = (l_ids == l_t) & (l_t >= 0) & (l_t < sw)
            term = jnp.where(hit, float(wgt), 0.0)
            m = term if m is None else m + term
        return m

    return band


def build_lane_bands(taps, w: int, w_arr: int, n_blocks: int,
                     stride: int = 1, fast3: bool = FILTER_FAST3):
    """Build the lane band matrices OUTSIDE the kernel (XLA, once per
    program call — round 3f).

    The in-kernel construction re-evaluates ``len(taps)`` iota-compare-add
    passes over every distinct (sw, 128) matrix in EVERY grid cell on the
    VPU (Mosaic executes the whole body per cell; it does not hoist
    loop-invariant tensor code across grid steps). At 128x1080p that is
    thousands of cells x ~5M elementwise ops for the 17-tap stats bands —
    a large share of the fused kernels' stage cost. Building them once in
    XLA and passing them as VMEM operands (constant index_map, so the
    pipeline elides the re-copies) removes that per-cell cost.

    Returns (stack, plan2): ``stack`` is (n_distinct, sw, bw) — bf16 with
    bw = 256 (the [hi | lo] tap concat) for fast3, f32 with bw = 128
    otherwise — and ``plan2`` a static tuple of (slice_start, sw, mat_idx)
    per output block, index into the distinct-matrix stack."""
    halo = len(taps) // 2
    plan = _lane_plan_raw(w, w_arr, n_blocks, stride, halo)
    mats = []
    plan2 = []
    shared_idx = None
    for b, (a, sw, pure) in enumerate(plan):
        if pure and shared_idx is not None:
            plan2.append((a, sw, shared_idx))
            continue
        mk = _lane_band_raw(b, a, sw, stride, halo, w, pure)
        if fast3:
            th, tl = _split_taps(taps)
            m = jnp.concatenate(
                [mk(th).astype(jnp.bfloat16), mk(tl).astype(jnp.bfloat16)],
                axis=1,
            )
        else:
            m = mk(taps)
        if pure:
            shared_idx = len(mats)
        plan2.append((a, sw, len(mats)))
        mats.append(m)
    return jnp.stack(mats), tuple(plan2)


def _filt_lanes_ext(x, bands_ref, plan2, fast3: bool, precision=None):
    """Lane-axis FIR with PRE-BUILT band matrices (``build_lane_bands``)
    read from a VMEM ref — the round-3f fast path of ``_filt_lanes_raw``."""
    prec = FILTER_PRECISION if precision is None else precision
    if fast3:
        xh, xl = _split_bf16(x)
        blocks = []
        for a, sw, k in plan2:
            m_hl = bands_ref[k]
            zh = jnp.dot(xh[:, a : a + sw], m_hl,
                         preferred_element_type=jnp.float32)
            zl = jnp.dot(xl[:, a : a + sw], m_hl[:, :128],
                         preferred_element_type=jnp.float32)
            blocks.append(zh[:, :128] + zh[:, 128:] + zl)
        return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, 1)
    blocks = []
    for a, sw, k in plan2:
        blocks.append(
            jnp.dot(x[:, a : a + sw], bands_ref[k],
                    preferred_element_type=jnp.float32, precision=prec)
        )
    return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, 1)


def _filt_lanes_raw(x, taps, w: int, n_blocks: int, stride: int = 1,
                    fast3: bool = FILTER_FAST3, precision=None):
    """Lane-axis FIR filter (optionally fused with 2x lane decimation via
    ``stride``) over a RAW-layout array as tiled banded matmuls on the MXU.

    ``x`` is (rows, w_arr) with valid data in lanes [0, w); the reflect
    border lives in the band matrices (``_lane_band_raw``), so no
    pre-padded layout is needed. Returns (rows, 128 * n_blocks); output
    lanes beyond ceil(w / stride) are finite garbage for the caller to
    mask. ``precision`` overrides FILTER_PRECISION (exact paths)."""
    w_arr = x.shape[-1]
    halo = len(taps) // 2
    plan = _lane_plan_raw(w, w_arr, n_blocks, stride, halo)
    prec = FILTER_PRECISION if precision is None else precision

    if fast3:
        # Manual 3-pass bf16: y = xh@mh + xh@ml + xl@mh. The xh terms run as
        # ONE matmul against the lane-concatenated [mh | ml] band (the
        # concat is on the small CONSTANT matrix); xl@mh is a second matmul.
        # Round 3e: the previous form concatenated the OPERANDS
        # ([xh|xh|xl] per block) into a tripled contraction — those per-
        # block VMEM operand copies dominated the dec stage of the fused
        # quality kernel (stage bisection: +45.6 ms vs ~7 ms of MXU FLOPs).
        th, tl = _split_taps(taps)
        shared = None
        mats = []
        for b, (a, sw, pure) in enumerate(plan):
            if pure and shared is not None:
                mats.append(shared)
                continue
            mk = _lane_band_raw(b, a, sw, stride, halo, w, pure)
            m_hl = jnp.concatenate(
                [mk(th).astype(jnp.bfloat16), mk(tl).astype(jnp.bfloat16)],
                axis=1,
            )
            m_h = mk(th).astype(jnp.bfloat16)
            if pure:
                shared = (m_hl, m_h)
            mats.append((m_hl, m_h))
        xh, xl = _split_bf16(x)
        blocks = []
        for (a, sw, pure), (m_hl, m_h) in zip(plan, mats):
            zh = jnp.dot(xh[:, a : a + sw], m_hl,
                         preferred_element_type=jnp.float32)
            zl = jnp.dot(xl[:, a : a + sw], m_h,
                         preferred_element_type=jnp.float32)
            blocks.append(zh[:, :128] + zh[:, 128:] + zl)
        return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, 1)

    shared = None
    bands = []
    for b, (a, sw, pure) in enumerate(plan):
        if pure:
            if shared is None:
                shared = _lane_band_raw(b, a, sw, stride, halo, w, True)(taps)
            bands.append(shared)
        else:
            bands.append(_lane_band_raw(b, a, sw, stride, halo, w, False)(taps))
    blocks = []
    for (a, sw, pure), m in zip(plan, bands):
        blocks.append(
            jnp.dot(x[:, a : a + sw], m,
                    preferred_element_type=jnp.float32, precision=prec)
        )
    return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, 1)


def _filt_rows_raw(lane_f, taps, n_seg: int, seg_out: int, seg_in: int,
                   stride: int, row0, st, h: int,
                   fast3: bool = FILTER_FAST3, precision=None,
                   exact_segs=None):
    """Sublane-axis FIR (optionally fused with 2x row decimation) over
    RAW-layout strips as per-segment banded matmuls on the MXU.

    ``lane_f`` stacks ``n_seg`` equal segments of ``seg_in`` DMA'd rows
    whose first row is raw row ``st`` (traced) — or is a LIST of ``n_seg``
    per-segment arrays (round 4: lets callers skip the VMEM concat copy).
    Output row x of a segment is the filter at raw row ``row0 + stride*x``
    (taps reflected at the image borders 0 / h-1). Returns
    (n_seg * seg_out, lanes).

    ``exact_segs`` (round 4): per-segment flag that the segment's values are
    integers <= 2^8 — EXACTLY representable in bf16 (raw uint8 luma). For
    such segments the fast3 lo-operand split is exactly zero, so its matmul
    and the split itself are skipped — numerically IDENTICAL output, one
    matmul + two VPU passes cheaper per segment.
    """
    if isinstance(lane_f, (list, tuple)):
        segs = list(lane_f)
    else:
        segs = [lane_f[m * seg_in : (m + 1) * seg_in] for m in range(n_seg)]
    if exact_segs is None:
        exact_segs = (False,) * n_seg
    o_ids = jax.lax.broadcasted_iota(jnp.int32, (seg_out, seg_in), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (seg_out, seg_in), 1)
    halo = len(taps) // 2
    prec = FILTER_PRECISION if precision is None else precision

    def mk_band(tp):
        band = None
        for t, wgt in enumerate(tp):
            rr = row0 + stride * o_ids + t - halo
            rr = jnp.abs(rr)
            rr = jnp.where(rr >= h, 2 * (h - 1) - rr, rr)
            term = jnp.where(l_ids == rr - st, float(wgt), 0.0)
            band = term if band is None else band + term
        return band

    if fast3:
        # Same operand-concat-free 3-pass as _filt_lanes_raw: the hi/lo tap
        # bands stack along OUTPUT rows (a constant), the operands are
        # plain slices.
        th, tl = _split_taps(taps)
        band2 = jnp.concatenate(
            [mk_band(th).astype(jnp.bfloat16),
             mk_band(tl).astype(jnp.bfloat16)], axis=0
        )
        band_h = None
        if not all(exact_segs):
            band_h = mk_band(th).astype(jnp.bfloat16)
        outs = []
        for m, seg in enumerate(segs):
            if exact_segs[m]:
                z = jnp.dot(band2, seg.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                outs.append(z[:seg_out] + z[seg_out:])
            else:
                segh, segl = _split_bf16(seg)
                z = jnp.dot(band2, segh, preferred_element_type=jnp.float32)
                zl = jnp.dot(band_h, segl, preferred_element_type=jnp.float32)
                outs.append(z[:seg_out] + z[seg_out:] + zl)
        return outs[0] if n_seg == 1 else jnp.concatenate(outs, axis=0)

    band = mk_band(taps)
    outs = [
        jnp.dot(
            band, seg,
            preferred_element_type=jnp.float32, precision=prec,
        )
        for seg in segs
    ]
    return outs[0] if n_seg == 1 else jnp.concatenate(outs, axis=0)


def _dma_row_start(row0, h_arr: int, rows: int):
    """8-aligned raw-row DMA start covering rows [row0 - 8, row0 + rows - 8)
    clamped into the array (multiply LAST so Mosaic can prove the sublane
    divisibility of the dynamic slice offset)."""
    return jnp.clip((row0 - 8) // 8, 0, (h_arr - rows) // 8) * 8


def stage_raw(x: jnp.ndarray, pad_rows: int, pad_lanes: int) -> jnp.ndarray:
    """XLA-side staging of a raw-luma kernel input.

    uint8 arrays are (edge-)padded in uint8 and BITCAST to int8 — int8 has
    first-class (32, 128) VMEM tiling and DMAs fine at the kernels'
    8-aligned dynamic row offsets (scripts/probe_int8_dma.py) — so the
    full-res ``astype(f32)`` HBM round trip disappears (~2 GB written +
    re-read per kernel per 128x1080p chunk, round 3i); the kernels rebuild
    values in VMEM via :func:`vmem_values`. Float inputs keep the f32
    astype(+pad) prep (chained decimated scales, CPU tests)."""
    if x.dtype == jnp.uint8:
        if pad_rows or pad_lanes:
            x = jnp.pad(x, ((0, 0), (0, pad_rows), (0, pad_lanes)),
                        mode="edge")
        return jax.lax.bitcast_convert_type(x, jnp.int8)
    x = x.astype(jnp.float32)
    if pad_rows or pad_lanes:
        x = jnp.pad(x, ((0, 0), (0, pad_rows), (0, pad_lanes)), mode="edge")
    return x


def unify_pair(*xs: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Give a kernel-input group ONE staging dtype: all-uint8 groups pass
    through (→ the int8 raw path); mixed groups fall back to f32 — the
    group shares VMEM scratch buffers, whose dtype must be uniform."""
    if all(x.dtype == jnp.uint8 for x in xs):
        return xs
    return tuple(x.astype(jnp.float32) for x in xs)


def vmem_values(x: jnp.ndarray) -> jnp.ndarray:
    """VMEM buffer load -> f32 values. int8 buffers hold bitcast uint8
    (see :func:`stage_raw`): rebuild as ``x + 256 * (x < 0)``; f32 buffers
    pass through."""
    if x.dtype == jnp.int8:
        f = x.astype(jnp.float32)
        return f + 256.0 * (f < 0)
    return x


def _vif_stats_sums(mom, strip: int, strip_valid, w: int, egl=None):
    """VIF information-fidelity statistics over a (5*strip, w_arr) stacked
    moment block [mu1|mu2|s11|s22|s12]; returns the strip's masked
    (num_sum, den_sum) scalars. Shared by the per-scale strip kernel, the
    fused quality kernel and the scales-1..3 tail kernel."""
    w_arr = mom.shape[-1]
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
        # NEG mode (libvmaf vif_enhn_gain_limit): cap the regression gain
        # AFTER the stability clamps, exactly as vmaf.vif._vif_scale_stats.
        g = jnp.minimum(g, float(egl))

    num = jnp.log2(1.0 + g * g * sigma1 / (sv + _SIGMA_NSQ))
    den = jnp.log2(1.0 + sigma1 / _SIGMA_NSQ)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (strip, w_arr), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (strip, w_arr), 1)
    valid = (row_ids < strip_valid) & (col_ids < w)
    num_sum = jnp.sum(jnp.where(valid, num, 0.0))
    den_sum = jnp.sum(jnp.where(valid, den, 0.0))
    return num_sum, den_sum


def _vif_scale_kernel(
    ref_hbm, dis_hbm, *refs,
    strip: int, h: int, w: int, h_arr: int, wq2,
    taps_stats, taps_dec, egl=None, fast3: bool = False, plans=None,
):
    """Grid (B, n_strips). Strip s covers output rows [s*strip, (s+1)*strip).

    Generic over the VIF scale: ``taps_stats`` is the scale's Gaussian
    moment-filter (17/9/5/3 taps for scales 0-3), ``taps_dec`` the NEXT
    scale's pre-decimation filter (or None at the last scale, which then
    emits no decimated outputs).

    Round 3e: reads the RAW (unpadded) luma — the reflect borders live in
    the band matrices (``_lane_band_raw`` / ``_filt_rows_raw``) and the DMA
    window is the 8-aligned clamp of [s*strip - 8, s*strip + strip + 8)
    (the XLA pad prep measured ~30 ms/kernel at 128x1080p, the largest
    single cost — see scripts/probe_adm_stages.py). The 2x LANE decimation
    of the next-scale inputs now also fuses into the dec lane band
    (stride=2), so the kernel writes half-width dec outputs directly and
    the external ``even_lanes`` matmul + crop copies are gone.
    """
    stats_b = dec_b = None
    if plans is not None and taps_dec is not None:
        (stats_b, dec_b, out_nd_ref, dec_ref_out, dec_dis_out,
         rbuf, dbuf, sem_r, sem_d) = refs
    elif plans is not None:
        stats_b, out_nd_ref, rbuf, dbuf, sem_r, sem_d = refs
    elif taps_dec is not None:
        out_nd_ref, dec_ref_out, dec_dis_out, rbuf, dbuf, sem_r, sem_d = refs
    else:
        out_nd_ref, rbuf, dbuf, sem_r, sem_d = refs
    i = pl.program_id(0)
    s = pl.program_id(1)
    rows = strip + 16
    row0 = s * strip
    st = _dma_row_start(row0, h_arr, rows)

    dma_r = pltpu.make_async_copy(
        ref_hbm.at[i, pl.ds(st, rows), :], rbuf, sem_r
    )
    dma_d = pltpu.make_async_copy(
        dis_hbm.at[i, pl.ds(st, rows), :], dbuf, sem_d
    )
    dma_r.start()
    dma_d.start()
    dma_r.wait()
    dma_d.wait()

    r = vmem_values(rbuf[...])
    d = vmem_values(dbuf[...])
    w_arr = rbuf.shape[-1]
    # Raw uint8 luma values are integers <= 255 — EXACT in bf16, so their
    # fast3 lo split is exactly zero and its matmuls are skipped (round 4;
    # bit-identical output).
    int_exact = rbuf.dtype == jnp.int8

    # --- separable moment filters ------------------------------------------
    # Lane pass: after it, lane j holds the filtered value centered at
    # raw column j. The five moment inputs go in as per-segment arrays (no
    # VMEM concat copy — round 4). Sublane pass: per-segment banded matmuls
    # on the MXU that also restrict output to the strip's valid rows.
    # ROW pass FIRST (round 3e): it shrinks the sublane extent from the
    # DMA'd window (rows) to the strip before the lane pass runs, cutting
    # the lane pass's operand splits/copies and MXU rows by rows/strip
    # (1.5x for the moments, 3x for the decimation below).
    mom_rows = _filt_rows_raw(
        [r, d, r * r, d * d, r * d], taps_stats, 5, strip, rows, 1,
        row0, st, h, fast3,
        exact_segs=(int_exact, int_exact, False, False, False),
    )
    if plans is not None:
        mom = _filt_lanes_ext(mom_rows, stats_b, plans[0], fast3)
    else:
        mom = _filt_lanes_raw(mom_rows, taps_stats, w, w_arr // 128, 1, fast3)
    strip_valid = jnp.minimum(strip, h - row0)  # ragged last strip
    num_sum, den_sum = _vif_stats_sums(mom, strip, strip_valid, w, egl)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    packed = jnp.where(lane == 0, num_sum, jnp.where(lane == 1, den_sum, 0.0))
    out_nd_ref[0, s, :] = packed[0]

    # --- next-scale filter + 2x decimation (both axes fused) ----------------
    if taps_dec is None:
        return
    # Lane pass fuses the 9/5/3-tap filter WITH the 2x lane decimation
    # (stride=2 bands); the sublane pass fuses the row filter with the 2x
    # row decimation: decimated output row rr reads raw rows
    # [2*(s*half + rr) - halo_dec, ...] of the same DMA'd window.
    half = strip // 2
    dec_rows = _filt_rows_raw(
        [r, d], taps_dec, 2, half, rows, 2, row0, st, h, fast3,
        exact_segs=(int_exact, int_exact),
    )
    if plans is not None:
        dec = _filt_lanes_ext(dec_rows, dec_b, plans[1], fast3)
    else:
        dec = _filt_lanes_raw(dec_rows, taps_dec, w, wq2 // 128, 2, fast3)
    dec_ref_out[0, :, :] = dec[0:half]
    dec_dis_out[0, :, :] = dec[half : 2 * half]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "egl", "interpret", "fast3", "h", "w", "crop",
                     "ext_bands"),
)
def vif_scale_pallas(
    ref_y: jnp.ndarray, dis_y: jnp.ndarray, scale: int, egl=None,
    interpret: bool = False, fast3=None,
    h: int | None = None, w: int | None = None, crop: bool = True,
    ext_bands: bool = True,
):
    """Fused VIF at one scale over (B, H, W) float/uint8 luma.

    For scales 0-2 returns (vif_scale (B,), dec_ref (B, ceil(H/2),
    ceil(W/2)), dec_dis) — the per-frame feature plus the NEXT scale's
    inputs (filtered with the next scale's Gaussian and decimated on both
    axes, identical to `vmaf.filters` semantics). For scale 3 returns
    (vif_scale3, None, None).

    The kernel reads the RAW arrays (no XLA pad prep — round 3e, see
    ``_vif_scale_kernel``). ``h``/``w`` give the VALID dims when the inputs
    carry block padding (the chained dec outputs do); with ``crop=False``
    the dec outputs keep their block padding so the next scale consumes
    them without crop copies.

    ``fast3`` (None = auto, see ``resolve_fast3``) selects the manual 3-pass
    bf16 filter matmuls — applied at scales <= 1 ONLY: scale 0 holds >90% of
    the filter FLOPs and its per-scale feature error is ~2e-4, but letting
    the error compound through all three decimation stages reaches ~4e-3 at
    scale 3 (measured on-device); scales 2-3 frames are 16-64x smaller, so
    running them exact costs ~nothing and caps the end-to-end error at the
    scale-1 level (~5e-4).
    """
    b, h_in, w_in = ref_y.shape
    h = h_in if h is None else h
    w = w_in if w is None else w
    f3 = resolve_fast3(fast3) and scale <= 1
    # Grid-cell count matters little (ADM strip A/Bs were neutral); strips
    # are sized so the VMEM footprint (scales with strip x width) fits the
    # 16 MB scoped budget at each scale's width.
    if w >= 1536:
        strip = 32
    elif w >= 640:
        strip = 64
    else:
        strip = 128
    while strip > 16 and strip - h >= 16:
        strip //= 2  # don't overshoot short frames (strip stays mult of 8)
    while strip > 8 and strip + 16 > h_in:
        strip //= 2  # raw-input DMA window must fit the array rows
    n_stats = 2 ** (4 - scale) + 1
    taps_stats = tuple(float(v) for v in gaussian_kernel(n_stats, n_stats / 5.0))
    if scale < 3:
        n_dec = 2 ** (3 - scale) + 1
        taps_dec = tuple(float(v) for v in gaussian_kernel(n_dec, n_dec / 5.0))
    else:
        taps_dec = None

    rows = strip + 16
    n_strips = -(-h // strip)  # ceil: last strip ragged when h % strip != 0
    hd = (h + 1) // 2  # decimate2 keeps even indices
    wd = (w + 1) // 2
    wq2 = 128 * (-(-wd // 128))

    # DMA alignment fallback (never hit at 1080p/4K or by chained outputs):
    # lane width % 128, rows % 8, rows >= window.
    pad_rows = max(_round_up(h_in, 8), rows) - h_in
    pad_lanes = _round_up(w_in, 128) - w_in

    ref_y, dis_y = unify_pair(ref_y, dis_y)
    ref_p = stage_raw(ref_y, pad_rows, pad_lanes)
    dis_p = stage_raw(dis_y, pad_rows, pad_lanes)
    buf_dtype = ref_p.dtype  # int8 for raw uint8 inputs (round 3i)

    h_arr = h_in + pad_rows
    w_arr = w_in + pad_lanes

    nd_shape = jax.ShapeDtypeStruct((b, n_strips, 128), jnp.float32)
    nd_spec = pl.BlockSpec(
        (1, n_strips, 128), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dec_shape = jax.ShapeDtypeStruct(
        (b, n_strips * strip // 2, wq2), jnp.float32
    )
    dec_spec = pl.BlockSpec(
        (1, strip // 2, wq2), lambda i, s: (i, s, 0), memory_space=pltpu.VMEM
    )

    inputs = [ref_p, dis_p]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    plans = None
    if ext_bands:
        stats_bands, stats_plan = build_lane_bands(
            taps_stats, w, w_arr, w_arr // 128, 1, f3)
        band_ins = [stats_bands]
        if taps_dec is not None:
            dec_bands, dec_plan = build_lane_bands(
                taps_dec, w, w_arr, wq2 // 128, 2, f3)
            band_ins.append(dec_bands)
            plans = (stats_plan, dec_plan)
        else:
            plans = (stats_plan,)
        for bnd in band_ins:
            inputs.append(bnd)
            in_specs.append(pl.BlockSpec(
                bnd.shape, lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM
            ))

    outs = pl.pallas_call(
        functools.partial(
            _vif_scale_kernel, strip=strip, h=h, w=w, h_arr=h_arr, wq2=wq2,
            taps_stats=taps_stats, taps_dec=taps_dec, egl=egl, fast3=f3,
            plans=plans,
        ),
        out_shape=(nd_shape, dec_shape, dec_shape) if taps_dec else (nd_shape,),
        grid=(b, n_strips),
        in_specs=in_specs,
        out_specs=(nd_spec, dec_spec, dec_spec) if taps_dec else (nd_spec,),
        scratch_shapes=[
            pltpu.VMEM((rows, w_arr), buf_dtype),
            pltpu.VMEM((rows, w_arr), buf_dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(*inputs)

    out_nd = outs[0]
    num = jnp.sum(out_nd[..., 0], axis=-1)
    den = jnp.sum(out_nd[..., 1], axis=-1)
    vif = num / jnp.maximum(den, _EPS)
    if taps_dec is None:
        return vif, None, None
    if crop:
        return vif, outs[1][:, :hd, :wd], outs[2][:, :hd, :wd]
    return vif, outs[1], outs[2]


def _vif_tail_kernel(
    ref_hbm, dis_hbm, *refs,
    h1: int, w1: int, h1_arr: int, w1_arr: int,
    chunk: tuple, egl, f3_1: bool, plans,
    raw: tuple | None = None,
):
    """Grid (B,): VIF scales 1-3 for ONE frame per cell — the whole scale-1
    frame (already 9-tap-filtered + decimated by the scale-0 kernel) lives
    in VMEM; scales 2 and 3 chain in-register with no HBM round trips.

    Scale 1's moment/dec filters run in ``n_chunks`` static row chunks of
    ``chunk`` output rows (bounds the live temporaries: a whole-frame
    5-moment stack at 1024 lanes is ~11 MB — over the scoped-VMEM budget);
    scales 2 and 3 are small enough to run in one piece. ``plans`` carries
    the five pre-built lane-band stacks' static plans (stats1, dec1, stats2,
    dec2, stats3 — ``build_lane_bands``).

    Replaces three strip kernels (1920 grid cells at 128x1080p) with 128
    per-frame cells and kills the scale-2/3 input HBM round trips (round 4,
    VERDICT r3 next #1). Capability parity:
    /root/reference/video_processing.py:280-282 (libvmaf VIF features).

    ``raw`` (round 4b): ``(h0, w0, dec0_plan)`` — the DMA'd buffers hold the
    RAW scale-0 luma (int8-staged uint8) and the scale-1 inputs are derived
    per chunk by the 9-tap pre-decimation filter IN-KERNEL (band structure
    identical to the fused quality kernel's stage 6), at per-frame MXU
    shapes (M ~ 2x(ch+16) vs the strip
    kernel's M=32). Kills the dec HBM round trip (~1 GB/128-frame chunk)
    and the strip kernel's 13.7 ms dec stage.
    """
    if raw is not None:
        (dec0_b, stats1_b, dec1_b, stats2_b, dec2_b, stats3_b,
         out_ref, rbuf, dbuf, r2_buf, d2_buf, r3_buf, d3_buf,
         sem_r, sem_d) = refs
        (dec0_p, stats1_p, dec1_p, stats2_p, dec2_p, stats3_p) = plans
        h0, w0 = raw
    else:
        (stats1_b, dec1_b, stats2_b, dec2_b, stats3_b,
         out_ref, rbuf, dbuf, r2_buf, d2_buf, r3_buf, d3_buf,
         sem_r, sem_d) = refs
        (stats1_p, dec1_p, stats2_p, dec2_p, stats3_p) = plans
    i = pl.program_id(0)

    dma_r = pltpu.make_async_copy(ref_hbm.at[i], rbuf, sem_r)
    dma_d = pltpu.make_async_copy(dis_hbm.at[i], dbuf, sem_d)
    dma_r.start()
    dma_d.start()
    dma_r.wait()
    dma_d.wait()

    taps_s1 = tuple(float(v) for v in gaussian_kernel(9, 9 / 5.0))
    taps_d1 = tuple(float(v) for v in gaussian_kernel(5, 5 / 5.0))
    taps_d2 = tuple(float(v) for v in gaussian_kernel(3, 3 / 5.0))

    def scale_pass(get_window, src_rows, taps_s, taps_d, stats_bp, dec_bp,
                   h_s, w_s, ch, n_ch, f3, dst_r, dst_d):
        """One VIF scale over VMEM-resident inputs, in static row chunks
        (chunking caps the live moment temporaries — the whole-frame stack
        at 1024 lanes overflowed the 16 MB scoped-VMEM budget by ~3 MB):
        accumulates the scale's (num, den) and writes the next scale's
        decimated inputs into ``dst_r``/``dst_d``. ``get_window(st, win)``
        returns the (win, lanes) input pair whose first row is scale row
        ``st`` — a buffer slice, or the raw-mode in-kernel decimation."""
        win = min(ch + 16, src_rows)
        half_ch = ch // 2
        num = den = jnp.float32(0.0)
        for c in range(n_ch):
            row0 = c * ch
            st = min(max(row0 - 8, 0), src_rows - win)
            st = (st // 8) * 8
            wr, wd = get_window(st, win)
            mom_rows = _filt_rows_raw(
                [wr, wd, wr * wr, wd * wd, wr * wd], taps_s, 5, ch,
                win, 1, row0, st, h_s, f3,
            )
            mom = _filt_lanes_ext(mom_rows, stats_bp[0], stats_bp[1], f3)
            sv = min(ch, max(h_s - row0, 0))
            ns, ds = _vif_stats_sums(mom, ch, sv, w_s, egl)
            num = num + ns
            den = den + ds
            if taps_d is None:
                continue
            dec_rows = _filt_rows_raw(
                [wr, wd], taps_d, 2, half_ch, win, 2, row0, st, h_s, f3
            )
            dec = _filt_lanes_ext(dec_rows, dec_bp[0], dec_bp[1], f3)
            dst_r[c * half_ch : (c + 1) * half_ch, :] = dec[0:half_ch]
            dst_d[c * half_ch : (c + 1) * half_ch, :] = dec[half_ch:]
        return num, den

    ch1, n1, ch2, n2, ch3, n3 = chunk
    h2, w2 = (h1 + 1) // 2, (w1 + 1) // 2
    h3, w3 = (h2 + 1) // 2, (w2 + 1) // 2

    def buf_window(src_r, src_d):
        return lambda st, win: (src_r[st : st + win], src_d[st : st + win])

    if raw is not None:
        # Scale-1 inputs derived from the raw luma per chunk: the 9-tap
        # pre-decimation filter (stage 6 of the fused quality kernel,
        # identical band structure -> bit-equal values).
        taps_d0 = tuple(float(v) for v in gaussian_kernel(9, 9 / 5.0))
        int_exact = rbuf.dtype == jnp.int8
        rows_buf = rbuf.shape[0]

        # NOTE: rebuilding the uint8 values directly in bf16 (skipping the
        # f32 relayout) fails Mosaic compilation on hardware (HTTP 500 in
        # tpu_compile_helper, 2026-08-19) though interpret mode accepts it —
        # keep the f32 vmem_values rebuild.
        def raw_window(st1, win1):
            rows0 = min(-(-(2 * win1 + 40) // 32) * 32, rows_buf)
            st0 = min(max((2 * st1 - 4) // 32, 0),
                      (rows_buf - rows0) // 32) * 32
            wr_raw = vmem_values(rbuf[st0 : st0 + rows0])
            wd_raw = vmem_values(dbuf[st0 : st0 + rows0])
            dec_rows = _filt_rows_raw(
                [wr_raw, wd_raw], taps_d0, 2, win1, rows0, 2,
                2 * st1, st0, h0, f3_1,
                exact_segs=(int_exact, int_exact),
            )
            dec = _filt_lanes_ext(dec_rows, dec0_b, dec0_p, f3_1)
            return dec[:win1], dec[win1:]

        get_w1, rows1 = raw_window, n1 * ch1 + 16
    else:
        get_w1, rows1 = buf_window(rbuf, dbuf), rbuf.shape[0]

    num1, den1 = scale_pass(
        get_w1, rows1, taps_s1, taps_d1, (stats1_b, stats1_p),
        (dec1_b, dec1_p), h1, w1, ch1, n1, f3_1, r2_buf, d2_buf,
    )
    # Scales 2-3 run exact (fast3 is gated to scales <= 1).
    num2, den2 = scale_pass(
        buf_window(r2_buf, d2_buf), r2_buf.shape[0], taps_d1, taps_d2,
        (stats2_b, stats2_p),
        (dec2_b, dec2_p), h2, w2, ch2, n2, False, r3_buf, d3_buf,
    )
    num3, den3 = scale_pass(
        buf_window(r3_buf, d3_buf), r3_buf.shape[0], taps_d2, None,
        (stats3_b, stats3_p),
        (None, None), h3, w3, ch3, n3, False, None, None,
    )

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    packed = jnp.zeros((1, 128), jnp.float32)
    for ln, val in enumerate((num1, den1, num2, den2, num3, den3)):
        packed = jnp.where(lane == ln, val, packed)
    out_ref[0, :, :] = jnp.broadcast_to(packed, (8, 128))


@functools.partial(
    jax.jit,
    static_argnames=("egl", "interpret", "fast3", "h", "w", "raw",
                     "raw_ch1"),
)
def vif_tail_pallas(
    dec_ref: jnp.ndarray, dec_dis: jnp.ndarray, egl=None,
    interpret: bool = False, fast3=None,
    h: int | None = None, w: int | None = None, raw: bool = False,
    raw_ch1: int | None = None,
):
    """VIF scales 1-3 as ONE per-frame Pallas kernel (``_vif_tail_kernel``).

    Default mode — ``dec_ref``/``dec_dis``: (B, H1p, W1p) float32 scale-1
    inputs, possibly block-padded (``quality_fused_pallas(..., crop=False)``);
    ``h``/``w`` give the VALID scale-1 dims (default: the array dims).

    ``raw=True`` (round 4b) — the inputs are the RAW scale-0 luma pair
    (uint8/int8-stageable; ``h``/``w`` are the scale-0 dims) and the kernel
    derives the scale-1 inputs itself with the 9-tap pre-decimation filter
    (same taps, band builders, and exact-int fast3 gating as the fused
    quality kernel's stage 6 — identical values; the scale-1 sums differ
    only in chunk partial-sum order, ~1e-6 rel). Lets the quality kernel skip
    that stage and its dec HBM round trip entirely
    (``quality_fused_pallas(..., emit_dec=False)``).

    Returns ``{"vif_scale1": (B,), "vif_scale2": ..., "vif_scale3": ...}``
    matching the chained ``vif_scale_pallas`` calls (same filters, same
    fast3 gating: scale 1 fast3-eligible, scales 2-3 exact).

    Sized for scale-1 widths <= ~1024 lanes (1080p-class input): the whole
    input frame pair plus the scale-2 scratch must fit VMEM (raw mode
    int8-stages uint8 luma — 2 MB/frame at 1080p). Callers route wider
    inputs to the per-scale chain.
    """
    b, h_in, w_in = dec_ref.shape
    f3_1 = resolve_fast3(fast3)  # scale-1 is fast3-eligible (scale <= 1)
    if raw:
        h0 = h_in if h is None else h
        w0 = w_in if w is None else w
        h1, w1 = (h0 + 1) // 2, (w0 + 1) // 2
    else:
        h1 = h_in if h is None else h
        w1 = w_in if w is None else w

    def plan_chunks(h_valid: int, cap: int = 64) -> tuple[int, int]:
        """Rows per chunk (multiple of 16: the dec writes are ch/2-row
        sublane-aligned slices) and chunk count for one scale."""
        ch = cap
        while ch > 16 and ch - h_valid >= ch // 2:
            ch //= 2  # short frames: don't run mostly-masked chunks
        return ch, -(-h_valid // ch)

    # Raw-mode ch1 (static, A/B-able): 32 = safe VMEM default; 64 halves
    # the chunk count + halo overlap but roughly doubles the live per-chunk
    # raw window + dec temporaries.
    ch1, n1 = plan_chunks(h1, (raw_ch1 or 32) if raw else 64)
    if raw:
        # Raw luma staged as-is (int8 bitcast for uint8); rows must hold the
        # largest 32-aligned raw chunk window.
        rows0_max = min(-(-(2 * (ch1 + 16) + 40) // 32) * 32,
                        _round_up(h_in, 32))
        pad_rows = max(_round_up(h_in, 32), rows0_max) - h_in
        pad_lanes = _round_up(w_in, 128) - w_in
        dec_ref, dec_dis = unify_pair(dec_ref, dec_dis)
        ref_p = stage_raw(dec_ref, pad_rows, pad_lanes)
        dis_p = stage_raw(dec_dis, pad_rows, pad_lanes)
        w1_arr = 128 * (-(-w1 // 128))
        h1_arr = n1 * ch1 + 16  # virtual scale-1 grid (windows generated)
    else:
        # Row/lane padding so the chunk windows + DMA contract hold.
        pad_rows = max(_round_up(h_in, 8), ch1 + 16) - h_in
        pad_lanes = _round_up(w_in, 128) - w_in
        ref_p = stage_raw(dec_ref.astype(jnp.float32), pad_rows, pad_lanes)
        dis_p = stage_raw(dec_dis.astype(jnp.float32), pad_rows, pad_lanes)
        h1_arr = h_in + pad_rows
        w1_arr = w_in + pad_lanes

    h2, w2 = (h1 + 1) // 2, (w1 + 1) // 2
    w2_arr = 128 * (-(-w2 // 128))
    h2_arr = n1 * (ch1 // 2)
    ch2, n2 = plan_chunks(h2)
    h3, w3 = (h2 + 1) // 2, (w2 + 1) // 2
    w3_arr = 128 * (-(-w3 // 128))
    h3_arr = n2 * (ch2 // 2)
    ch3, n3 = plan_chunks(h3)
    chunks = (ch1, n1, ch2, n2, ch3, n3)

    taps_s1 = tuple(float(v) for v in gaussian_kernel(9, 9 / 5.0))
    taps_d1 = tuple(float(v) for v in gaussian_kernel(5, 5 / 5.0))
    taps_d2 = tuple(float(v) for v in gaussian_kernel(3, 3 / 5.0))

    stats1_b, stats1_p = build_lane_bands(
        taps_s1, w1, w1_arr, w1_arr // 128, 1, f3_1)
    dec1_b, dec1_p = build_lane_bands(
        taps_d1, w1, w1_arr, w2_arr // 128, 2, f3_1)
    stats2_b, stats2_p = build_lane_bands(
        taps_d1, w2, w2_arr, w2_arr // 128, 1, False)
    dec2_b, dec2_p = build_lane_bands(
        taps_d2, w2, w2_arr, w3_arr // 128, 2, False)
    stats3_b, stats3_p = build_lane_bands(
        taps_d2, w3, w3_arr, w3_arr // 128, 1, False)
    plans = (stats1_p, dec1_p, stats2_p, dec2_p, stats3_p)
    band_ins = [stats1_b, dec1_b, stats2_b, dec2_b, stats3_b]
    raw_dims = None
    if raw:
        # Same taps/band builder as the fused quality kernel's dec stage.
        w0_arr = w_in + pad_lanes
        dec0_b, dec0_p = build_lane_bands(
            taps_s1, w0, w0_arr, w1_arr // 128, 2, f3_1)
        band_ins = [dec0_b] + band_ins
        plans = (dec0_p,) + plans
        raw_dims = (h0, w0)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ] + [
        pl.BlockSpec(bnd.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        for bnd in band_ins
    ]

    out_shape = jax.ShapeDtypeStruct((b, 8, 128), jnp.float32)
    out_spec = pl.BlockSpec(
        (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    if raw:
        in_bufs = [
            pltpu.VMEM((h_in + pad_rows, w0_arr), ref_p.dtype),
            pltpu.VMEM((h_in + pad_rows, w0_arr), ref_p.dtype),
        ]
    else:
        in_bufs = [
            pltpu.VMEM((h1_arr, w1_arr), jnp.float32),
            pltpu.VMEM((h1_arr, w1_arr), jnp.float32),
        ]

    out = pl.pallas_call(
        functools.partial(
            _vif_tail_kernel, h1=h1, w1=w1, h1_arr=h1_arr, w1_arr=w1_arr,
            chunk=chunks, egl=egl, f3_1=f3_1, plans=plans, raw=raw_dims,
        ),
        out_shape=out_shape,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=in_bufs + [
            pltpu.VMEM((h2_arr, w2_arr), jnp.float32),
            pltpu.VMEM((h2_arr, w2_arr), jnp.float32),
            pltpu.VMEM((h3_arr, w3_arr), jnp.float32),
            pltpu.VMEM((h3_arr, w3_arr), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        # Raw mode in EXACT (f32) precision overflows Mosaic's default 16 MB
        # scoped-vmem budget at 1080p (22.65 MB measured on v5e — the f32
        # chunk temporaries are ~2x the bf16 fast3 ones; the production
        # fast3 path fits). The chip has 128 MB of VMEM — raise the budget
        # like the motion kernel does rather than shrink chunks (which
        # costs halo-overlap recompute per chunk). Wide inputs (4K-class
        # scale-1 frames, round 5) stage ~23 MB of scratch — 64 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(64 if w1_arr > 1024 else 32) * 1024 * 1024
        ) if raw or w1_arr > 1024 else None,
        interpret=interpret,
    )(ref_p, dis_p, *band_ins)

    packed = out[:, 0, :]
    res = {}
    for scale, ln in ((1, 0), (2, 2), (3, 4)):
        res[f"vif_scale{scale}"] = packed[:, ln] / jnp.maximum(
            packed[:, ln + 1], _EPS
        )
    return res


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
    h, w = int(ref_y.shape[-2]), int(ref_y.shape[-1])
    for scale in range(4):
        v, ref, dis = vif_scale_pallas(
            ref, dis, scale, egl=egl, interpret=interpret, fast3=fast3,
            h=h, w=w, crop=False,
        )
        h, w = (h + 1) // 2, (w + 1) // 2
        out[f"vif_scale{scale}"] = v
    return out
