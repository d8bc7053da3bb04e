"""Degenerate-input behavior: tiny clips, single frames, empty series."""

from fractions import Fraction

import numpy as np
import pytest

from rtvqa_tpu.io import video as vio
from rtvqa_tpu.metrics.complexity import calculate_average_scene_complexity
from rtvqa_tpu.metrics.full_reference import analyze_full_reference, auto_chunk


def tiny_clip(path, n):
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (n, 32, 48, 3), dtype=np.uint8)
    vio.encode_raw_rgb(path, rgb, fps=Fraction(30, 1), crf=20)


def test_single_frame_clip(tmp_path):
    p = str(tmp_path / "one.mp4")
    tiny_clip(p, 1)
    clip = vio.decode_sampled(p, 1)
    assert clip.y.shape[0] == 1
    res = calculate_average_scene_complexity(clip, 16, 16)
    # No pairs exist: every pair-based metric is 0.0 (documented divergence
    # from the reference's NaN-from-empty-mean).
    assert res.motion == 0.0
    assert res.dct == 0.0
    assert res.temporal_dct == 0.0
    assert res.framerate == 0.0


def test_two_frame_clip(tmp_path):
    p = str(tmp_path / "two.mp4")
    tiny_clip(p, 2)
    clip = vio.decode_sampled(p, 1)
    res = calculate_average_scene_complexity(clip, 16, 16)
    # One pair: spatial metrics defined, temporal-DCT still empty.
    assert res.dct > 0.0
    assert res.histogram > 0.0
    assert res.temporal_dct == 0.0


def test_interval_larger_than_clip(tmp_path):
    p = str(tmp_path / "short.mp4")
    tiny_clip(p, 5)
    clip = vio.decode_sampled(p, frame_interval=10)
    assert clip.y.shape[0] == 0  # no frame index reaches the interval
    res = calculate_average_scene_complexity(clip, 16, 16)
    assert res.dct == 0.0 and res.motion == 0.0


def test_full_reference_single_frame(tmp_path):
    p = str(tmp_path / "one.mp4")
    tiny_clip(p, 1)
    out = analyze_full_reference(p, p)
    assert out["n_frames"] == 1
    assert out["ssim"] == pytest.approx(1.0, abs=1e-6)
    assert out["per_frame"]["motion2"][0] == 0.0


def test_auto_chunk_scaling():
    assert auto_chunk(1920, 1080) == 64
    assert auto_chunk(1920, 1080, requested=2) == 2
    assert auto_chunk(1920, 1080, requested=128) == 64  # capped by budget
    assert auto_chunk(128, 96) >= 64                    # small frames batch more
    assert auto_chunk(3840, 2160) == 16
    assert auto_chunk(1920, 1080, requested=5) == 4     # kept even
