"""Native IO robustness: corrupted/truncated inputs must raise, not crash."""

import numpy as np
import pytest

from rtvqa_tpu.io import video as vio
from rtvqa_tpu.io.stream import VideoStream


def test_garbage_file_raises(tmp_path):
    p = tmp_path / "garbage.mp4"
    p.write_bytes(np.random.default_rng(0).bytes(4096))
    with pytest.raises(RuntimeError):
        vio.decode_sampled(str(p), 1)
    with pytest.raises(RuntimeError):
        vio.get_video_info(str(p))
    with pytest.raises(RuntimeError):
        VideoStream(str(p), 1)


def test_empty_file_raises(tmp_path):
    p = tmp_path / "empty.mp4"
    p.write_bytes(b"")
    with pytest.raises(RuntimeError):
        vio.decode_sampled(str(p), 1)


def test_truncated_file(tmp_path):
    # A valid header with a chopped mdat: decoder should yield what it can
    # or raise — never crash.
    from fractions import Fraction

    full = tmp_path / "full.mp4"
    rgb = np.random.default_rng(1).integers(0, 256, (12, 32, 48, 3), dtype=np.uint8)
    vio.encode_raw_rgb(str(full), rgb, fps=Fraction(30, 1), crf=20)
    data = full.read_bytes()
    trunc = tmp_path / "trunc.mp4"
    trunc.write_bytes(data[: len(data) // 2])
    try:
        clip = vio.decode_sampled(str(trunc), 1)
        assert clip.y.shape[0] <= 12
    except RuntimeError:
        pass  # clean error is acceptable too


def test_transcode_garbage_raises(tmp_path):
    p = tmp_path / "garbage.mp4"
    p.write_bytes(b"\x00" * 1000)
    with pytest.raises(RuntimeError):
        vio.transcode(str(p), str(tmp_path / "out.mp4"), crf=30)


def test_encode_to_missing_directory_raises(tmp_path):
    # Regression: av_write_trailer on a never-opened muxer used to segfault.
    rgb = np.zeros((2, 16, 16, 3), np.uint8)
    from fractions import Fraction

    with pytest.raises(RuntimeError):
        vio.encode_raw_rgb(
            str(tmp_path / "no_such_dir" / "out.mp4"), rgb, fps=Fraction(30, 1)
        )
    # transcode to a missing directory must also raise cleanly
    src = str(tmp_path / "src.mp4")
    vio.encode_raw_rgb(src, rgb, fps=Fraction(30, 1))
    with pytest.raises(RuntimeError):
        vio.transcode(src, str(tmp_path / "no_such_dir" / "out.mp4"))
