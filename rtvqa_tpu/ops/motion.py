"""Block-matching motion complexity.

The reference's motion metric is the mean Farneback optical-flow magnitude
between sampled frame pairs at full resolution
(``complexity_metrics.py:313-343``). Farneback's iterative polynomial
expansion is a poor fit for the MXU/VPU; per the BASELINE.md north star the
TPU framework substitutes **block matching** — a documented behavioral
substitution (SURVEY.md §2 native-component table, hard part 5):

* partition the current frame into ``block x block`` tiles;
* for each tile, find the integer displacement within ``±radius`` minimizing
  SAD against the previous frame (replicate-padded at borders);
* the metric is the mean displacement magnitude over tiles — same units as
  mean flow magnitude (pixels per sampled-frame step).

Two search modes (``docs/PARITY.md`` §motion):

* **full** (``block_match_motion``): exhaustive over all (2r+1)^2 candidate
  displacements at full resolution;
* **pyramid** (``block_match_motion_pyramid``, the production default):
  2x2-mean downsample, exhaustive search at half resolution with
  block/2, radius/2, displacement magnitudes scaled by 2. Covers the SAME
  ±radius full-resolution span at ~1/14 the arithmetic (candidates /3.6,
  pixels /4), quantized to even displacements — the closest analog of the
  reference Farneback's own pyramid (its defaults are 3 levels, pyr_scale
  0.5, ``complexity_metrics.py:336-340``).

Implementation: one ``lax.scan`` over the (2r+1)^2 candidate displacements.
Each step is a dynamic-slice of the padded previous frame + an elementwise
SAD + a blockwise sum (reshape-reduce) — fully static shapes, everything
batched over frames. Running argmin keeps (best_sad, best_dy, best_dx).

Scale note: ties are broken toward the smaller raster-scan candidate index
(first minimum wins), so static scenes report exactly 0.0 in both modes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def block_match_motion(
    prev_gray: jnp.ndarray,
    curr_gray: jnp.ndarray,
    block: int = 16,
    radius: int = 8,
) -> jnp.ndarray:
    """Mean block displacement magnitude per pair: (..., H, W) -> (...,).

    H, W are cropped down to multiples of ``block`` (cv2's Farneback also
    effectively ignores sub-block remainders at the border).
    """
    h, w = curr_gray.shape[-2], curr_gray.shape[-1]
    hb, wb = (h // block) * block, (w // block) * block
    curr = curr_gray[..., :hb, :wb].astype(jnp.float32)
    prev = prev_gray[..., :hb, :wb].astype(jnp.float32)

    pad = [(0, 0)] * (prev.ndim - 2) + [(radius, radius), (radius, radius)]
    prev_p = jnp.pad(prev, pad, mode="edge")

    lead = curr.shape[:-2]
    nby, nbx = hb // block, wb // block

    def block_sad(shifted_prev):
        d = jnp.abs(curr - shifted_prev)
        d = d.reshape(*lead, nby, block, nbx, block)
        return jnp.sum(d, axis=(-3, -1))  # (..., nby, nbx)

    side = 2 * radius + 1
    dys, dxs = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    candidates = jnp.asarray(
        np.stack([dys.ravel(), dxs.ravel()], axis=-1), dtype=jnp.int32
    )

    big = jnp.full((*lead, nby, nbx), jnp.inf, dtype=jnp.float32)
    zero = jnp.zeros((*lead, nby, nbx), dtype=jnp.float32)

    def step(carry, disp):
        best_sad, best_dy, best_dx = carry
        dy, dx = disp[0], disp[1]
        start = (0,) * len(lead) + (dy, dx)
        shifted = jax.lax.dynamic_slice(prev_p, start, curr.shape)
        sad = block_sad(shifted)
        better = sad < best_sad  # strict: first (raster-order) minimum wins
        fdy = (dy - radius).astype(jnp.float32)
        fdx = (dx - radius).astype(jnp.float32)
        best_sad = jnp.where(better, sad, best_sad)
        best_dy = jnp.where(better, fdy, best_dy)
        best_dx = jnp.where(better, fdx, best_dx)
        return (best_sad, best_dy, best_dx), None

    (best_sad, best_dy, best_dx), _ = jax.lax.scan(
        step, (big, zero, zero), candidates
    )
    mag = jnp.sqrt(best_dy * best_dy + best_dx * best_dx)
    return jnp.mean(mag, axis=(-2, -1))


def down2_mean(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean pooling (..., H, W) -> (..., H//2, W//2); odd tails cropped.

    ``lax.reduce_window`` form — BITWISE equal to the reshape-reduce form
    (probed on the v5e, max_abs_diff 0 on 128x1080p) but avoids its
    lane-splitting reshape relayout: feeding the Pallas search kernel
    standalone, pooling+search dropped 445 ms -> 60 ms
    (scripts/probe_down2_chunk.py, round 3b). Inside the fused complexity
    suite the win is small — interleaved same-session A/B measured 176.9 vs
    180.4 ms median (scripts/probe_down2_suite_ab.py; XLA already fuses the
    reshape form well there, packed-output diff 6.7e-6, no argmin tie flips).
    The HIGHEST-precision pooling-matmul variants were ~15 ms slower AND only
    equal to ~8e-6 (argmin tie-break hazard) — don't revisit.
    """
    h = (x.shape[-2] // 2) * 2
    w = (x.shape[-1] // 2) * 2
    xc = x[..., :h, :w].astype(jnp.float32)
    window = (1,) * (xc.ndim - 2) + (2, 2)
    return 0.25 * jax.lax.reduce_window(
        xc, 0.0, jax.lax.add, window, window, "VALID"
    )


def _down2_mean_reshape(x: jnp.ndarray) -> jnp.ndarray:
    """The round-3a reshape-reduce form, kept for in-session A/B probes
    (29 ms in-situ vs 47 ms for four strided slices at 128x1080p f32)."""
    h = (x.shape[-2] // 2) * 2
    w = (x.shape[-1] // 2) * 2
    xc = x[..., :h, :w].astype(jnp.float32)
    xr = xc.reshape(*xc.shape[:-2], h // 2, 2, w // 2, 2)
    return 0.25 * xr.sum(axis=(-3, -1))


def block_match_motion_pyramid(
    prev_gray: jnp.ndarray,
    curr_gray: jnp.ndarray,
    block: int = 16,
    radius: int = 8,
    impl: str = "xla",
    interpret: bool = False,
) -> jnp.ndarray:
    """Pyramid (coarse-level) block-matching motion: (..., H, W) -> (...,).

    Downsample 2x (mean pool), exhaustive search with block/2 and radius/2,
    displacement magnitudes scaled back by 2 — the same spatial blocks and
    the same ±radius search span as the full search, at ~1/14 the VPU work
    (see module docstring). ``impl``: "xla" or "pallas" (the VMEM-staged
    kernel, TPU only; ``interpret`` for CPU testing).
    """
    bp = max(block // 2, 1)
    rp = max(radius // 2, 1)
    pg = down2_mean(prev_gray)
    cg = down2_mean(curr_gray)
    if impl == "pallas":
        from rtvqa_tpu.kernels.motion_pallas import block_match_motion_pallas

        return 2.0 * block_match_motion_pallas(
            pg, cg, block=bp, radius=rp, interpret=interpret
        )
    return 2.0 * block_match_motion(pg, cg, block=bp, radius=rp)


def block_match_motion_pyramid_series(
    gray_series: jnp.ndarray,
    block: int = 16,
    radius: int = 8,
    impl: str = "xla",
    interpret: bool = False,
) -> jnp.ndarray:
    """Pyramid motion over consecutive pairs of one frame series:
    (N, H, W) -> (N-1,).

    Equivalent to ``block_match_motion_pyramid(g[:-1], g[1:])`` but pools the
    series ONCE — the 2x2-mean downsample is HBM-bandwidth-bound (~29 ms for
    128 x 1080p on the v5e even in the reshape-reduce form, see
    ``down2_mean``), and the pairwise form pays it twice on 99%-overlapping
    slices (frame-axis slicing commutes with spatial pooling).
    """
    bp = max(block // 2, 1)
    rp = max(radius // 2, 1)
    gh = down2_mean(gray_series)
    if impl == "pallas":
        from rtvqa_tpu.kernels.motion_pallas import block_match_motion_pallas

        return 2.0 * block_match_motion_pallas(
            gh[:-1], gh[1:], block=bp, radius=rp, interpret=interpret
        )
    return 2.0 * block_match_motion(gh[:-1], gh[1:], block=bp, radius=rp)


def fps_variation(timestamps_ms: jnp.ndarray, valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Instantaneous fps ``1/dt`` per consecutive sampled-timestamp pair.

    Matches ``process_frame_interval_for_parallel``
    (``complexity_metrics.py:150-165``): nonpositive dt -> 0.0. Input is the
    (possibly padded) (..., N) timestamp vector in milliseconds with a
    validity mask; returns ((..., N-1) fps values, (..., N-1) pair validity).
    """
    ts = timestamps_ms.astype(jnp.float32)
    dt = (ts[..., 1:] - ts[..., :-1]) / 1000.0
    fps = jnp.where(dt > 0, 1.0 / jnp.maximum(dt, 1e-9), 0.0)
    pair_valid = valid[..., 1:] & valid[..., :-1]
    return fps * pair_valid.astype(fps.dtype), pair_valid
