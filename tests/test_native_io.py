"""Native IO layer: encode -> probe -> decode roundtrip, sampling semantics."""

from fractions import Fraction

import numpy as np
import pytest

from rtvqa_tpu.io import video as vio


def make_rgb_frames(n=25, h=96, w=128, seed=7):
    """Synthetic clip: moving gradient + noise, distinct per frame."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        base = ((xx * 2 + yy + i * 9) % 256).astype(np.uint8)
        f = np.stack([base, np.roll(base, i, axis=1), 255 - base], axis=-1)
        noise = rng.integers(0, 12, size=(h, w, 3), dtype=np.uint8)
        frames.append(np.clip(f.astype(np.int16) + noise, 0, 255).astype(np.uint8))
    return np.stack(frames)


@pytest.fixture(scope="module")
def clip_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("clips") / "clip.mp4")
    vio.encode_raw_rgb(path, make_rgb_frames(), fps=Fraction(30, 1), crf=18)
    return path


def test_validate_video_path():
    assert vio.validate_video_path("a.mp4") == "video"
    assert vio.validate_video_path("a.png") == "frame"
    with pytest.raises(ValueError):
        vio.validate_video_path("a.txt")
    with pytest.raises(ValueError):
        vio.validate_video_path(123)  # type: ignore[arg-type]


def test_probe(clip_path):
    info = vio.get_video_info(clip_path)
    assert info.width == 128 and info.height == 96
    assert info.resolution == "128x96"
    assert info.frame_rate == pytest.approx(30.0)
    assert info.bitrate_kbps > 0


def test_decode_all_frames(clip_path):
    clip = vio.decode_sampled(clip_path, frame_interval=1)
    assert clip.y.shape == (25, 96, 128)
    assert clip.u.shape == (25, 48, 64)
    assert clip.n_frames_total == 25
    # Timestamps must be monotonically increasing ~33.3ms apart.
    dts = np.diff(clip.timestamps_ms)
    assert np.all(dts > 0)
    np.testing.assert_allclose(dts, 1000.0 / 30.0, atol=1.0)


def test_decode_sampling_interval(clip_path):
    # 1-based counting: frames 10 and 20 and... of 25 -> 2 sampled at interval 10
    clip = vio.decode_sampled(clip_path, frame_interval=10)
    assert clip.y.shape[0] == 2
    full = vio.decode_sampled(clip_path, frame_interval=1)
    np.testing.assert_array_equal(clip.y[0], full.y[9])
    np.testing.assert_array_equal(clip.y[1], full.y[19])
    # Timestamps come from the same pass and correspond to the SAME frames
    # (fixes reference off-by-one, SURVEY.md §2.4(4)).
    np.testing.assert_allclose(clip.timestamps_ms, full.timestamps_ms[[9, 19]])


def test_decode_content_roundtrip(clip_path):
    # CRF 18 encode should preserve luma closely: compare Y plane vs source.
    from rtvqa_tpu.ops.color import rgb_to_yuv420_np

    src_y, _, _ = rgb_to_yuv420_np(make_rgb_frames())
    clip = vio.decode_sampled(clip_path, frame_interval=1)
    err = np.abs(clip.y.astype(np.int16) - src_y.astype(np.int16))
    assert float(np.mean(err)) < 6.0


def test_transcode(clip_path, tmp_path):
    out = str(tmp_path / "encoded.mp4")
    vio.transcode(clip_path, out, crf=30, preset="veryfast")
    info = vio.get_video_info(out)
    assert info.width == 128 and info.height == 96
    re = vio.decode_sampled(out, frame_interval=1)
    assert re.y.shape[0] == 25
    # Higher CRF -> smaller file than the CRF-18 source.
    import os

    assert os.path.getsize(out) < os.path.getsize(clip_path)


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        vio.decode_sampled("/nonexistent/clip.mp4", 1)


def test_decode_threads_deterministic(clip_path):
    # num_workers plumbs to the decoder thread count; output must be
    # identical regardless (SURVEY.md §2.4(8) — honoured, not just accepted).
    a = vio.decode_sampled(clip_path, 1, threads=1)
    b = vio.decode_sampled(clip_path, 1, threads=4)
    np.testing.assert_array_equal(a.y, b.y)
    np.testing.assert_array_equal(a.u, b.u)
    np.testing.assert_allclose(a.timestamps_ms, b.timestamps_ms)


def test_encode_deterministic_under_heap_churn(clip_path, tmp_path):
    """Encodes must be a pure function of (pixels, settings).

    Regression: this image's libx264 mbtree lookahead read heap-dependent
    state, so the same transcode produced pixel-different bitstreams whenever
    unrelated allocations ran in between (and across processes). The encoder
    now pins threads=1 and disables mbtree (docs/PARITY.md divergence).
    """
    import jax.numpy as jnp

    outs = []
    for rep in range(3):
        out = str(tmp_path / f"det{rep}.mp4")
        vio.transcode(clip_path, out, crf=30, preset="medium")
        outs.append(vio.decode_sampled(out, 1).y)
        # Heap churn between encodes (this used to flip the bitstream).
        _ = np.asarray(jnp.ones((8, 64, 64)) * (rep + 1))
        _ = vio.decode_sampled(out, 3)
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[1], outs[2])
