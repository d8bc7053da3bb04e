"""Shared builder for the REAL-CONTENT 1080p golden clips (VERDICT r3 next
#4): camera-plausible synthetic frames (bench.make_video_frames recipe) run
through the in-process libx264 encoder at CRF 18, re-encoded at CRF 28, and
decoded back — real codec artifacts, not raw synthetic noise.

Determinism: the encoder is pinned to threads=1 + mbtree=0 (bit-reproducible
bitstreams — docs/PARITY.md encode row, tests/test_native_io.py), so the
decoded planes are identical across runs and machines with this libx264
build; the golden test asserts the decoded-luma digest separately from the
feature values to tell encoder drift from metric drift.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

N_FRAMES = 12
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "real_1080p_features.npz")
FEATURE_KEYS = ("vif_scale0", "vif_scale1", "vif_scale2", "vif_scale3",
                "adm2", "motion2", "psnr", "ssim")


def build_pair(tmpdir: str) -> tuple[str, str]:
    """Encode the deterministic 1080p clip pair into ``tmpdir``."""
    from fractions import Fraction

    import bench
    from rtvqa_tpu.io import video as vio

    y, u, v = bench.make_video_frames(N_FRAMES, variant=0)
    ref = os.path.join(tmpdir, "golden_ref.mp4")
    dis = os.path.join(tmpdir, "golden_dis.mp4")
    vio.encode_raw_yuv420(ref, y, u, v, fps=Fraction(30, 1), crf=18,
                          preset="veryfast")
    vio.transcode(ref, dis, crf=28, preset="veryfast")
    return ref, dis


def decoded_luma_digest(path: str) -> str:
    """SHA-256 over the decoded luma planes (encoder/decoder drift probe)."""
    from rtvqa_tpu.io import video as vio

    clip = vio.decode_sampled(path, frame_interval=1)
    return hashlib.sha256(np.ascontiguousarray(clip.y).tobytes()).hexdigest()


def compute_features(ref: str, dis: str) -> dict[str, np.ndarray]:
    """Per-frame quality features through the production engine."""
    from rtvqa_tpu.metrics.full_reference import analyze_full_reference

    res = analyze_full_reference(ref, dis, chunk=4)
    assert res["n_frames"] == N_FRAMES, res["n_frames"]
    pf = res["per_frame"]
    return {k: np.asarray(pf[k], np.float32) for k in FEATURE_KEYS}
