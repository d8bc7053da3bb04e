"""Streaming complexity analysis for long clips (bounded host + device memory).

`calculate_average_scene_complexity` materializes all sampled frames; at
frame_interval=1 on an hour-long 1080p clip that is tens of GB. This driver
streams sampled-frame batches (prefetched native decode), runs ONE jitted
program per chunk that produces the eight per-frame metric values packed as
an (8, chunk) array (a single device→host fetch per chunk — RPC round trips
per fetched array dominate on remote-execution tunnels), carries the 1-frame
temporal halo across chunk boundaries on the host, and finishes with the
exponential smoothing + means over the accumulated scalar series (N floats —
negligible host work, numerically identical to the fused path; verified in
tests).

Per-global-frame value semantics are those of `parallel.sharding`
(`_per_frame_values`): slot g holds metrics of sampled frame g vs g-1; the
reference's series are re-indexings of these slots.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rtvqa_tpu.io.stream import VideoStream, prefetch
from rtvqa_tpu.metrics.complexity import ComplexityResult, METRIC_ORDER
from rtvqa_tpu.parallel.sharding import _per_frame_values

# Packed row order for the seven device-computed values (framerate variation
# is computed on the host from timestamps).
VALUE_KEYS = ("motion", "dct", "histogram", "edge", "orb", "color", "temporal_dct")


@functools.partial(
    jax.jit,
    static_argnames=("resize_h", "resize_w", "block", "radius", "edge_low", "edge_high"),
)
def _chunk_values(
    y, u, v, prev_y, prev_u, prev_v, *,
    resize_h, resize_w, block=16, radius=8, edge_low=100.0, edge_high=200.0,
):
    vals = _per_frame_values(
        y[None], u[None], v[None], prev_y[None], prev_u[None], prev_v[None],
        resize_h=resize_h, resize_w=resize_w, block=block, radius=radius,
        edge_low=edge_low, edge_high=edge_high,
    )
    return jnp.stack([vals[k][0].astype(jnp.float32) for k in VALUE_KEYS])


def _ewm_mean_host(series: np.ndarray, alpha: float) -> float:
    """pandas-equivalent ewm(adjust=True).mean() then mean — on N scalars."""
    if series.size == 0:
        return 0.0
    w = (1.0 - alpha) ** np.arange(series.size, dtype=np.float64)
    num = np.cumsum(w[::-1])  # denominator terms
    # adjust=True: y_t = sum_{i<=t} (1-a)^(t-i) x_i / sum (1-a)^(t-i)
    s = np.zeros(series.size, np.float64)
    c = np.zeros(series.size, np.float64)
    acc_s, acc_c = 0.0, 0.0
    for t in range(series.size):
        acc_s = (1.0 - alpha) * acc_s + series[t]
        acc_c = (1.0 - alpha) * acc_c + 1.0
        s[t] = acc_s
        c[t] = acc_c
    return float(np.mean(s / c))


def calculate_average_scene_complexity_streaming(
    video_path: str,
    resize_width: int,
    resize_height: int,
    frame_interval: int = 10,
    smoothing_factor: float = 0.8,
    chunk: int = 32,
    block: int = 16,
    radius: int = 8,
) -> ComplexityResult:
    """Streaming equivalent of `calculate_average_scene_complexity`."""
    stream = VideoStream(video_path, frame_interval, chunk)
    it = prefetch(stream, depth=1)

    values = {k: [] for k in VALUE_KEYS}
    timestamps: list[np.ndarray] = []
    prev_tail: Optional[tuple] = None  # last (y, u, v) frame of previous chunk
    n_total = 0

    for fb in it:
        n = fb.y.shape[0]
        if prev_tail is None:
            # Global slot 0 has no predecessor; feed zeros — its value is
            # dropped by the series re-indexing below anyway.
            py = np.concatenate([np.zeros_like(fb.y[:1]), fb.y[:-1]], 0)
            pu = np.concatenate([np.zeros_like(fb.u[:1]), fb.u[:-1]], 0)
            pv = np.concatenate([np.zeros_like(fb.v[:1]), fb.v[:-1]], 0)
        else:
            py = np.concatenate([prev_tail[0][None], fb.y[:-1]], 0)
            pu = np.concatenate([prev_tail[1][None], fb.u[:-1]], 0)
            pv = np.concatenate([prev_tail[2][None], fb.v[:-1]], 0)
        prev_tail = (fb.y[-1], fb.u[-1], fb.v[-1])

        # Pad the ragged tail chunk to the static chunk size.
        pad = chunk - n
        if pad:
            def p(a):
                return np.concatenate([a, np.repeat(a[-1:], pad, 0)], 0)
            fb_y, fb_u, fb_v, py, pu, pv = p(fb.y), p(fb.u), p(fb.v), p(py), p(pu), p(pv)
        else:
            fb_y, fb_u, fb_v = fb.y, fb.u, fb.v

        packed = np.asarray(
            _chunk_values(
                fb_y, fb_u, fb_v, py, pu, pv,
                resize_h=resize_height, resize_w=resize_width,
                block=block, radius=radius,
            )
        )  # one fetch per chunk
        for row, k in enumerate(VALUE_KEYS):
            values[k].append(packed[row, :n])
        timestamps.append(fb.timestamps_ms)
        n_total += n

    if n_total < 2:
        return ComplexityResult(**{k: 0.0 for k in METRIC_ORDER})

    series = {k: np.concatenate(v) for k, v in values.items()}
    ts = np.concatenate(timestamps)
    a = float(smoothing_factor)

    out = {}
    for k in ("motion", "dct", "histogram", "edge", "orb", "color"):
        out[k] = _ewm_mean_host(series[k][1:], a)        # slots g=1..N-1
    out["temporal_dct"] = _ewm_mean_host(series["temporal_dct"][2:], a)
    dt = np.diff(ts) / 1000.0
    fps = np.where(dt > 0, 1.0 / np.maximum(dt, 1e-9), 0.0)
    out["framerate"] = _ewm_mean_host(fps, a)
    return ComplexityResult(**out)
