from fractions import Fraction

import numpy as np
import pytest

from rtvqa_tpu.io import video as vio
from rtvqa_tpu.metrics.complexity import (
    calculate_average_scene_complexity,
    calculate_scene_complexity_score,
    scene_complexity_score,
)
from rtvqa_tpu.pipeline.batch_analyzer import analyze_clips_sharded


def write_clip(path, n, seed):
    rng = np.random.default_rng(seed)
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.stack(
        [
            np.clip(
                ((xx * 2 + yy + 4 * i) % 256) + rng.integers(0, 10, (h, w)), 0, 255
            ).astype(np.uint8)
            for i in range(n)
        ]
    )
    rgb = np.stack([frames, 255 - frames, frames // 2], -1)
    vio.encode_raw_rgb(path, rgb, fps=Fraction(24, 1), crf=18)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    paths = []
    for i, n in enumerate([20, 14, 26]):
        p = str(d / f"clip{i}.mp4")
        write_clip(p, n, seed=i)
        paths.append(p)
    return paths


def test_batch_matches_per_clip(corpus):
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    batch = analyze_clips_sharded(
        corpus, resize_width=32, resize_height=32, frame_interval=2
    )
    assert len(batch) == 3
    for path, res in zip(corpus, batch):
        clip = vio.decode_sampled(path, 2)
        solo = calculate_average_scene_complexity(clip, 32, 32)
        for key in ("dct", "histogram", "edge", "color", "temporal_dct", "framerate"):
            got = getattr(res, key)
            exp = getattr(solo, key)
            assert got == pytest.approx(exp, rel=2e-3, abs=2e-3), (path, key)


def test_mixed_resolution_rejected(corpus, tmp_path):
    odd = str(tmp_path / "odd.mp4")
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)
    vio.encode_raw_rgb(odd, rgb, fps=Fraction(24, 1))
    with pytest.raises(ValueError):
        analyze_clips_sharded(corpus + [odd], 32, 32, 2)


def test_scorer(corpus):
    clip = vio.decode_sampled(corpus[0], 2)
    score = calculate_scene_complexity_score(clip, 32, 32)
    assert 0.0 <= score <= 1.5
    res = calculate_average_scene_complexity(clip, 32, 32)
    assert score == pytest.approx(scene_complexity_score(res))
