"""Pallas TPU kernel: planar YUV420 (uint8) -> full-range gray (float32).

Replaces ``ops.color.yuv420_to_gray`` on the TPU hot path (the reference
converts decoded BGR per frame with ``cv2.cvtColor``,
``complexity_metrics.py:332-333``). The XLA form costs ~36 ms real per
128x1080p batch (round-3g profile): the 2x2 chroma ``jnp.repeat`` upsample is
a lane relayout XLA materializes, and the clipped R/G/B planes materialize
around it — ~7 full-res f32 arrays of HBM traffic for what is arithmetically
a single elementwise pass. This kernel streams uint8 strips through VMEM
(BlockSpec auto-pipelining; gray is pointwise so no halo and no manual DMA),
upsamples chroma with banded MXU matmuls, and writes only the f32 gray:

* **lane (2x) upsample** — per 128-lane output tile, output lane ``l`` reads
  chroma lane ``l // 2``: a (sw, 128) 0/1 band matmul against a 128-aligned
  slice of the chroma buffer (same externalized-operand scheme as
  ``vif_pallas.build_lane_bands``, round 3f: built once in XLA, constant
  index map, never rebuilt on the VPU);
* **row (2x) upsample** — one (strip, strip/2) 0/1 matmul;
* both matmuls run at DEFAULT precision: operands are uint8-valued integers
  (<= 255, exact in bf16) against 0/1 bands with ONE nonzero per output —
  the f32 result is exact;
* the BT.601 limited->RGB affine + [0,255] clip + luma weights run
  elementwise on the strip and only the gray strip leaves VMEM.

uint8 planes are bitcast to int8 for the VMEM refs (int8 has first-class
(32, 128) tiling); values are rebuilt in-kernel as ``x + 256 * (x < 0)``.

Equivalence: interpret-mode tests vs ``ops.color.yuv420_to_gray`` (exact to
f32 rounding of the identical expression); on-device parity asserted by
``bench.py --validate``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtvqa_tpu.ops.color import (
    GRAY_B,
    GRAY_G,
    GRAY_R,
    _U_B,
    _U_G,
    _V_G,
    _V_R,
    _Y_SCALE,
)

STRIP = 64          # luma rows per grid cell (chroma: STRIP // 2)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rep2_lane_band(sw: int, delta: int) -> jnp.ndarray:
    """(sw, 128) 0/1 band for ``c[:, a:a+sw] @ M``: output lane l of the
    128-lane tile reads chroma lane ``delta + l // 2`` of the slice."""
    j = jax.lax.broadcasted_iota(jnp.int32, (sw, 128), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (sw, 128), 1)
    return jnp.where(j == delta + l // 2, 1.0, 0.0)


def build_rep2_lane_bands(w_arr: int, wc_arr: int):
    """Band stack + static (slice_start, matrix_index) plan covering
    ``n_tiles = w_arr // 128`` output tiles; slice width ``sw`` covers the
    64 chroma lanes a tile reads plus the 128-alignment slack."""
    n_tiles = w_arr // 128
    sw = min(256, wc_arr)
    mats, deltas, plan = [], {}, []
    for t in range(n_tiles):
        a_t = min((64 * t // 128) * 128, wc_arr - sw)
        delta = 64 * t - a_t
        if delta not in deltas:
            deltas[delta] = len(mats)
            mats.append(_rep2_lane_band(sw, delta))
        plan.append((a_t, deltas[delta]))
    return jnp.stack(mats), tuple(plan), sw


def _i8_to_u8f(x: jnp.ndarray) -> jnp.ndarray:
    """int8 bit-pattern -> original uint8 value as float32."""
    f = x.astype(jnp.float32)
    return f + 256.0 * (f < 0)


def _gray_kernel(y_ref, u_ref, v_ref, bands_ref, rep_row_ref, out_ref,
                 *, plan, sw: int):
    yf = _i8_to_u8f(y_ref[0]) - 16.0                      # (strip, w_arr)

    def upsample(c_ref):
        c = _i8_to_u8f(c_ref[0])                          # (strip/2, wc_arr)
        lanes = [
            jnp.dot(c[:, a : a + sw], bands_ref[k],
                    preferred_element_type=jnp.float32)
            for a, k in plan
        ]
        half = lanes[0] if len(lanes) == 1 else jnp.concatenate(lanes, axis=1)
        return jnp.dot(rep_row_ref[...], half,
                       preferred_element_type=jnp.float32)

    uf = upsample(u_ref) - 128.0
    vf = upsample(v_ref) - 128.0
    r = jnp.clip(_Y_SCALE * yf + _V_R * vf, 0.0, 255.0)
    g = jnp.clip(_Y_SCALE * yf + _U_G * uf + _V_G * vf, 0.0, 255.0)
    b = jnp.clip(_Y_SCALE * yf + _U_B * uf, 0.0, 255.0)
    out_ref[0] = GRAY_R * r + GRAY_G * g + GRAY_B * b


@functools.partial(jax.jit, static_argnames=("interpret", "strip"))
def yuv420_to_gray_pallas(
    y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, interpret: bool = False,
    strip: int | None = None,
) -> jnp.ndarray:
    """(B, H, W) + 2x (B, ceil(H/2), ceil(W/2)) uint8 -> (B, H, W) float32
    gray, identical expression to :func:`ops.color.yuv420_to_gray`.

    ``strip`` overrides the luma rows per grid cell (probe knob, round-5
    strip-height sweeps; must be a multiple of 16 so the chroma strip
    keeps >= 8 int8 sublanes)."""
    b, h, w = y.shape
    h2, w2 = u.shape[-2], u.shape[-1]
    strip = strip or STRIP
    if _round_up(h, 8) < strip:
        # int8 VMEM tiling needs >= 32 chroma sublanes per block; tiny
        # frames don't amortize a kernel launch anyway.
        from rtvqa_tpu.ops.color import yuv420_to_gray

        return yuv420_to_gray(y, u, v)
    cstrip = strip // 2
    n_strips = -(-h // strip)
    h_arr = n_strips * strip
    w_arr = _round_up(w, 128)
    hc_arr = n_strips * cstrip
    wc_arr = max(_round_up(w2, 128), 128)

    def pad_to(x, rows, lanes):
        pr, pc = rows - x.shape[-2], lanes - x.shape[-1]
        if pr or pc:
            x = jnp.pad(x, ((0, 0), (0, pr), (0, pc)))
        return x

    # int8 views: uint8 has no first-class VMEM tiling; int8 does.
    y8 = jax.lax.bitcast_convert_type(pad_to(y, h_arr, w_arr), jnp.int8)
    u8 = jax.lax.bitcast_convert_type(pad_to(u, hc_arr, wc_arr), jnp.int8)
    v8 = jax.lax.bitcast_convert_type(pad_to(v, hc_arr, wc_arr), jnp.int8)

    bands, plan, sw = build_rep2_lane_bands(w_arr, wc_arr)
    ri = jax.lax.broadcasted_iota(jnp.int32, (strip, cstrip), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (strip, cstrip), 1)
    rep_row = jnp.where(rj == ri // 2, 1.0, 0.0)

    out = pl.pallas_call(
        functools.partial(_gray_kernel, plan=plan, sw=sw),
        out_shape=jax.ShapeDtypeStruct((b, h_arr, w_arr), jnp.float32),
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec((1, strip, w_arr), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cstrip, wc_arr), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cstrip, wc_arr), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bands.shape, lambda i, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(rep_row.shape, lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, strip, w_arr), lambda i, s: (i, s, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y8, u8, v8, bands, rep_row)
    return out[:, :h, :w]
