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

Dataflow per strip (round-2 MXU restructure): the five moment inputs are
stacked along sublanes so the 17-tap LANE pass runs as one set of 17
`pltpu.roll`s over the stack; the SUBLANE pass is one block-diagonal banded
matmul on the MXU (which also restricts statistics to the strip's valid rows
— the roll version computed and masked the halo rows too). The 9-tap filter
+ 2x row decimation for scale 1 is likewise one lane-roll pass over both
streams stacked plus one banded decimating matmul.

Layout rules honored (see CLAUDE.md): only static-shift `pltpu.roll` for
lane offsets, no lane-splitting reshapes (lane decimation uses a
0/1 selection matmul on the MXU), lane-aligned output blocks.

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

TAPS17 = gaussian_kernel(17, 17 / 5.0).astype(np.float32)
TAPS9 = gaussian_kernel(9, 9 / 5.0).astype(np.float32)
HALO = 8  # max filter half-width (17-tap)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _filt_lanes(x, taps, lanes_total):
    acc = None
    for t, w in enumerate(taps):
        sh = (lanes_total - t) % lanes_total
        term = float(w) * (pltpu.roll(x, sh, axis=1) if sh else x)
        acc = term if acc is None else acc + term
    return acc


def _vif0_kernel(
    ref_hbm, dis_hbm, out_nd_ref, dec_ref_out, dec_dis_out,
    rbuf, dbuf, sem_r, sem_d,
    *, strip: int, h: int, w: int, wq: int,
):
    """Grid (B, n_strips). Strip s covers output rows [s*strip, (s+1)*strip).

    Inputs are reflect-padded by HALO on both axes on the host: padded row r
    corresponds to original row r - HALO; the strip needs padded rows
    [s*strip, s*strip + strip + 2*HALO). When H is not a multiple of the
    strip size (e.g. 1080 = 67*16 + 8), the host edge-pads the bottom and the
    last strip masks its num/den sums to the ``h - s*strip`` valid rows.
    """
    i = pl.program_id(0)
    s = pl.program_id(1)
    rows = strip + 2 * HALO

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

    # --- 17-tap separable moment filters -----------------------------------
    # Lane pass: after it, lane j holds the filtered value centered at
    # original column j (window [j-8, j+8] in padded coords [j, j+16]). The
    # five moment inputs are STACKED along sublanes so the 17 `pltpu.roll`s
    # run once over a (5*rows, wq) array instead of 85 rolls over five
    # (rows, wq) arrays (VPU work is the same per element, but per-op roll
    # overhead dominates at this size — measured ~35% kernel time).
    # Sublane pass: ONE block-diagonal banded matmul on the MXU replaces the
    # 85 sublane rolls AND restricts output to the strip's valid rows (the
    # roll version computed statistics on all `rows` sublanes and masked
    # half of them away).
    stacked = jnp.concatenate([r, d, r * r, d * d, r * d], axis=0)
    lane_f = _filt_lanes(stacked, TAPS17, wq)

    # M[o, l] = taps[t] where l = (o//strip)*rows + (o%strip) + t: for output
    # row x of moment m, the 17-tap window over its own stacked segment.
    o_ids = jax.lax.broadcasted_iota(jnp.int32, (5 * strip, 5 * rows), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (5 * strip, 5 * rows), 1)
    dband = l_ids - ((o_ids // strip) * rows + o_ids % strip)
    mband = None
    for t, wgt in enumerate(TAPS17):
        term = jnp.where(dband == t, float(wgt), 0.0)
        mband = term if mband is None else mband + term
    mom = jnp.dot(
        mband, lane_f,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
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

    # --- 9-tap filter + 2x decimation for scale 1 --------------------------
    # The 9-tap window center must align with the 17-tap padding: original
    # column j sits at padded lane j + HALO, so shift the tap start by
    # HALO - 4 (= 8 - 9//2).
    off = HALO - len(TAPS9) // 2

    # Lane pass over both streams stacked (9 rolls on (2*rows, wq)), then
    # ONE banded matmul that fuses the 9-tap sublane filter WITH the 2x row
    # decimation: decimated output row rr of stream m reads its stacked
    # segment's padded rows [2*rr + off, 2*rr + off + 9). LANE decimation
    # happens OUTSIDE the kernel (filters.even_lanes, one MXU matmul on the
    # half-height array): an in-kernel (wq, wd) lane-selection matrix costs
    # 8 MB of VMEM at 1080p and blew the 16 MB scoped budget.
    rd_stack = jnp.concatenate([r, d], axis=0)
    lane9 = None
    for t, wgt in enumerate(TAPS9):
        sh = (wq - (t + off)) % wq
        term = float(wgt) * (pltpu.roll(rd_stack, sh, axis=1) if sh else rd_stack)
        lane9 = term if lane9 is None else lane9 + term

    half = strip // 2
    o9 = jax.lax.broadcasted_iota(jnp.int32, (2 * half, 2 * rows), 0)
    l9 = jax.lax.broadcasted_iota(jnp.int32, (2 * half, 2 * rows), 1)
    d9 = l9 - ((o9 // half) * rows + 2 * (o9 % half) + off)
    m9 = None
    for t, wgt in enumerate(TAPS9):
        term = jnp.where(d9 == t, float(wgt), 0.0)
        m9 = term if m9 is None else m9 + term
    # HIGHEST precision: default (bf16-class) matmul precision would round
    # the filtered values themselves.
    dec = jnp.dot(
        m9, lane9,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dec_ref_out[0, :, :] = dec[0:half]
    dec_dis_out[0, :, :] = dec[half : 2 * half]


@functools.partial(jax.jit, static_argnames=("interpret",))
def vif_scale0_pallas(ref_y: jnp.ndarray, dis_y: jnp.ndarray, interpret: bool = False):
    """Fused VIF scale 0 over (B, H, W) float/uint8 luma.

    Returns (vif_scale0 (B,), dec_ref (B, H/2, W/2), dec_dis (B, H/2, W/2)) —
    the per-frame scale-0 feature plus scale 1's inputs (9-tap filtered and
    decimated, identical to `vmaf.filters` semantics).

    H and W arbitrary (H >= 17 for the reflect halo); a ragged final row
    strip is masked in-kernel and its decimated tail sliced off.
    """
    b, h, w = ref_y.shape
    strip = 16
    ref = ref_y.astype(jnp.float32)
    dis = dis_y.astype(jnp.float32)

    n_strips = -(-h // strip)  # ceil: last strip ragged when h % 16 != 0
    h_pad = n_strips * strip
    wq = _round_up(w + 2 * HALO, 128)
    pad_rows = ((0, 0), (HALO, HALO), (0, 0))
    pad_cols_reflect = ((0, 0), (0, 0), (HALO, HALO))

    def prep(x):
        x = jnp.pad(x, pad_cols_reflect, mode="reflect")
        x = jnp.pad(x, pad_rows, mode="reflect")
        # Bottom edge-fill for the ragged strip (consumed only by masked-out
        # rows) + lane round-up.
        return jnp.pad(
            x, ((0, 0), (0, h_pad - h), (0, wq - w - 2 * HALO)), mode="edge"
        )

    ref_p = prep(ref)
    dis_p = prep(dis)

    rows = strip + 2 * HALO

    out_nd, dec_ref, dec_dis = pl.pallas_call(
        functools.partial(_vif0_kernel, strip=strip, h=h, w=w, wq=wq),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_strips, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, n_strips * strip // 2, wq), jnp.float32),
            jax.ShapeDtypeStruct((b, n_strips * strip // 2, wq), jnp.float32),
        ),
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, n_strips, 128), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, strip // 2, wq), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, strip // 2, wq), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, wq), jnp.float32),
            pltpu.VMEM((rows, wq), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(ref_p, dis_p)

    num = jnp.sum(out_nd[..., 0], axis=-1)
    den = jnp.sum(out_nd[..., 1], axis=-1)
    vif0 = num / jnp.maximum(den, _EPS)
    # Kernel outputs are row-decimated, full padded width; finish with the
    # lane decimation (one MXU selection matmul on the half-height array).
    hd = (h + 1) // 2  # decimate2 keeps even indices
    from rtvqa_tpu.vmaf.filters import even_lanes

    dr = even_lanes(dec_ref[:, :hd, :w])
    dd = even_lanes(dec_dis[:, :hd, :w])
    return vif0, dr, dd


def vif_features_pallas(ref_y: jnp.ndarray, dis_y: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """VIF at 4 scales with the fused Pallas scale-0; scales 1-3 in XLA
    (quarter-size and cheap). Matches `vmaf.vif.vif_features`."""
    from rtvqa_tpu.vmaf.vif import _vif_scale_stats

    interpret = jax.default_backend() == "cpu"
    vif0, ref, dis = vif_scale0_pallas(ref_y, dis_y, interpret=interpret)
    out = {"vif_scale0": vif0}
    for scale in range(1, 4):
        n = 2 ** (4 - scale) + 1
        taps = gaussian_kernel(n, n / 5.0)
        if scale > 1:
            from rtvqa_tpu.vmaf.filters import decimate2, filter1d_sep

            ref = decimate2(filter1d_sep(ref, taps))
            dis = decimate2(filter1d_sep(dis, taps))
        num, den = _vif_scale_stats(ref, dis, gaussian_kernel(n, n / 5.0))
        out[f"vif_scale{scale}"] = num / jnp.maximum(den, _EPS)
    return out
