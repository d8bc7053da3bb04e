"""Unified streaming full-reference engine: PSNR + SSIM + VMAF features in
one pass.

The reference runs one ffmpeg subprocess evaluating psnr, ssim and libvmaf
filter chains over both videos in a single decode pass
(``video_processing.py:270-297``). This is the TPU-native equivalent: both
videos stream through the native decoder in lockstep batches (prefetched on a
background thread — host decode overlaps device compute), and ONE jitted
chunk program computes every per-frame quantity:

* PSNR plane MSEs (vf_psnr semantics),
* SSIM Y/U/V/All (x264 algorithm),
* VIF scales 0-3 + ADM2 (VMAF spatial features),
* blurred-luma SADs for VMAF motion/motion2 (the one temporal feature —
  a single carried blurred frame stitches chunk boundaries).

Per-frame scalars return to the host; pooling (mean MSE → PSNR, mean SSIM,
per-frame SVR → mean VMAF) happens at the end. Device memory stays bounded
by the chunk size regardless of clip length.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rtvqa_tpu.io.stream import VideoStream, prefetch
from rtvqa_tpu.metrics.quality import psnr_frames, pooled_psnr, ssim_frames
from rtvqa_tpu.obs.logging import get_logger
from rtvqa_tpu.vmaf.adm import adm_features
from rtvqa_tpu.vmaf.filters import filter1d_sep
from rtvqa_tpu.vmaf.model import builtin_model, load_model
from rtvqa_tpu.vmaf.motion import FILTER_5
from rtvqa_tpu.vmaf.vif import vif_features

logger = get_logger("rtvqa_tpu.full_reference")


# Fixed order of the packed per-frame metric rows (one device->host fetch per
# chunk: on a remote-execution tunnel every fetched array costs a full RPC
# round trip, which dominated unpacked-dict timings ~30 ms per array).
CHUNK_KEYS = (
    "mse_y", "mse_u", "mse_v", "mse_avg", "psnr_y", "psnr_avg",
    "ssim_y", "ssim_u", "ssim_v", "ssim_all",
    "vif_scale0", "vif_scale1", "vif_scale2", "vif_scale3",
    "adm2", "motion_sad",
)


@jax.jit
def _chunk_program(ry, ru, rv, dy, du, dv, prev_blur, has_prev):
    """All per-frame metrics for one lockstep chunk.

    prev_blur: (H, W) blurred last ref-luma of the previous chunk;
    has_prev: () bool — False for the first chunk (motion[0] = 0).
    Returns (packed (len(CHUNK_KEYS), N) float32, new blur carry) — the carry
    stays on-device across chunks, the packed rows are one host fetch.
    """
    out = {}
    out.update(psnr_frames(ry, ru, rv, dy, du, dv))
    out.update(ssim_frames(ry, ru, rv, dy, du, dv))
    ryf = ry.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    out.update(vif_features(ryf, dyf))
    out.update(adm_features(ryf, dyf))

    blur = filter1d_sep(ryf, FILTER_5)
    prev = jnp.concatenate([prev_blur[None], blur[:-1]], axis=0)
    sad = jnp.mean(jnp.abs(blur - prev), axis=(-2, -1))
    # First frame of the very first chunk has no predecessor: SAD -> 0.
    sad = sad.at[0].set(jnp.where(has_prev, sad[0], 0.0))
    out["motion_sad"] = sad
    packed = jnp.stack([out[k].astype(jnp.float32) for k in CHUNK_KEYS])
    return packed, blur[-1]


def auto_chunk(width: int, height: int, requested: Optional[int] = None) -> int:
    """Frames per device chunk, scaled to resolution.

    The quality program's peak HBM footprint is ~30 float32 frame-sized
    intermediates per frame; the device slice available here rejects programs
    beyond ~4 simultaneous 1080p frames — scale the chunk so smaller frames
    batch more and larger frames batch less.
    """
    budget = max(1, int(4 * (1080 * 1920) / max(width * height, 1)))
    return max(1, min(requested or budget, budget))


def analyze_full_reference(
    ref_path: str,
    dis_path: str,
    chunk: Optional[int] = None,
    vmaf_model_path: Optional[str] = None,
) -> dict:
    """Stream both videos once; return pooled PSNR/SSIM/VMAF + per-frame series."""
    probe = VideoStream(ref_path, 1, 1)
    chunk = auto_chunk(probe.info.width, probe.info.height, chunk)
    probe.close()
    ref_it = prefetch(VideoStream(ref_path, 1, chunk), depth=1)
    dis_it = prefetch(VideoStream(dis_path, 1, chunk), depth=1)

    series: dict[str, list[np.ndarray]] = {}
    carry_blur = None
    first = True
    n_frames = 0

    while True:
        rb = next(ref_it, None)
        db = next(dis_it, None)
        if rb is None or db is None:
            break
        n = min(rb.y.shape[0], db.y.shape[0])
        if n == 0:
            break
        pad = chunk - n

        def prep(a, n=n, pad=pad):
            a = a[:n]
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, 0)], 0)
            return a

        if carry_blur is None:
            carry_blur = np.zeros(rb.y.shape[1:], np.float32)
        packed, carry_blur = _chunk_program(
            prep(rb.y), prep(rb.u), prep(rb.v),
            prep(db.y), prep(db.u), prep(db.v),
            carry_blur, jnp.asarray(not first),
        )
        packed = np.asarray(packed)  # ONE fetch per chunk
        for row, k in enumerate(CHUNK_KEYS):
            series.setdefault(k, []).append(packed[row, :n])
        n_frames += n
        first = False
        if rb.y.shape[0] != db.y.shape[0]:
            break  # one stream ended mid-batch: stop at the common prefix

    s = {k: np.concatenate(v) for k, v in series.items()}
    if n_frames == 0:
        return {"n_frames": 0}

    valid = np.ones(n_frames, bool)
    psnr = float(np.asarray(pooled_psnr(jnp.asarray(s["mse_avg"]), jnp.asarray(valid))))
    ssim = float(np.mean(s["ssim_all"]))

    # motion2[t] = min(sad[t], sad[t+1]); last frame keeps its backward SAD.
    sad = s["motion_sad"]
    fwd = np.concatenate([sad[1:], [np.inf]])
    motion2 = np.minimum(sad, fwd)
    motion2[0] = 0.0

    feats = {
        "adm2": s["adm2"],
        "motion2": motion2.astype(np.float32),
        "vif_scale0": s["vif_scale0"],
        "vif_scale1": s["vif_scale1"],
        "vif_scale2": s["vif_scale2"],
        "vif_scale3": s["vif_scale3"],
    }
    if vmaf_model_path:
        model = load_model(vmaf_model_path)
    else:
        model = builtin_model()
        logger.warning(
            "No VMAF model file given; using %s — scores are qualitative, not "
            "libvmaf-parity. Provide vmaf_v0.6.1.json via vmaf_model_path.",
            model.name,
        )
    vmaf_per_frame = np.asarray(model.predict(feats))

    return {
        "n_frames": n_frames,
        "psnr": psnr,
        "ssim": ssim,
        "vmaf": float(vmaf_per_frame.mean()),
        "per_frame": {
            "psnr": s["psnr_avg"] if "psnr_avg" in s else None,
            "ssim": s["ssim_all"],
            "vmaf": vmaf_per_frame,
            **feats,
        },
        "vmaf_model": model.name,
    }
