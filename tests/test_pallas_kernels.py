"""Pallas kernels vs their XLA op twins (interpret mode on CPU)."""

import numpy as np
import pytest

from rtvqa_tpu.kernels.motion_pallas import block_match_motion_pallas
from rtvqa_tpu.ops.motion import block_match_motion


@pytest.mark.parametrize("shape,block,radius", [((48, 64), 16, 8), ((64, 128), 16, 4)])
def test_block_match_pallas_matches_xla(rng, shape, block, radius):
    h, w = shape
    prev = rng.integers(0, 256, (2, h, w)).astype(np.float32)
    curr = np.stack(
        [np.roll(np.roll(prev[i], 2, 0), -3, 1) for i in range(2)]
    ).astype(np.float32)
    got = np.asarray(
        block_match_motion_pallas(prev, curr, block=block, radius=radius, interpret=True)
    )
    exp = np.asarray(block_match_motion(prev, curr, block=block, radius=radius))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_block_match_pallas_static(rng):
    f = rng.integers(0, 256, (1, 32, 128)).astype(np.float32)
    got = np.asarray(block_match_motion_pallas(f, f, block=16, radius=8, interpret=True))
    assert float(got[0]) == 0.0


def test_block_match_pyramid_pallas_matches_xla(rng):
    # The production complexity default: half-res search with block/2,
    # radius/2 through the VMEM kernel (bench runs this path on TPU).
    from rtvqa_tpu.ops.motion import block_match_motion_pyramid

    prev = rng.integers(0, 256, (2, 68, 130)).astype(np.float32)  # odd dims
    curr = np.stack(
        [np.roll(np.roll(prev[i], 4, 0), -6, 1) for i in range(2)]
    ).astype(np.float32)
    got = np.asarray(block_match_motion_pyramid(
        prev, curr, block=16, radius=8, impl="pallas", interpret=True
    ))
    exp = np.asarray(block_match_motion_pyramid(prev, curr, block=16, radius=8))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_block_match_pallas_large_kb_ragged(rng):
    # block=8 triggers kb=16 block-rows per cell; 150 rows -> 18 block-rows
    # = 2 strips with a ragged, masked-out tail (14 padded block-rows).
    prev = rng.integers(0, 256, (2, 150, 128)).astype(np.float32)
    curr = np.stack(
        [np.roll(np.roll(prev[i], 2, 0), -1, 1) for i in range(2)]
    ).astype(np.float32)
    got = np.asarray(
        block_match_motion_pallas(prev, curr, block=8, radius=4, interpret=True)
    )
    exp = np.asarray(block_match_motion(prev, curr, block=8, radius=4))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_block_match_pallas_small_block_full_radius_wide(rng):
    # block=8 with the FULL radius=8 on a wide frame: the scoped-VMEM budget
    # (side x kb*block x lanes) must keep kb at 4 here — kb=16 at full
    # radius was measured over the 64 MB budget on device. Interpret mode
    # checks the chosen configuration's semantics.
    prev = rng.integers(0, 256, (1, 64, 1408)).astype(np.float32)
    curr = np.roll(np.roll(prev, 3, 1), -2, 2)
    got = np.asarray(
        block_match_motion_pallas(prev, curr, block=8, radius=8, interpret=True)
    )
    exp = np.asarray(block_match_motion(prev, curr, block=8, radius=8))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_block_match_pallas_wide_frame(rng):
    # >128 blocks per row (the 4K case) exercises multi-tile lane pooling.
    prev = rng.integers(0, 256, (1, 32, 2176)).astype(np.float32)
    curr = np.roll(prev, 3, axis=2)
    got = np.asarray(
        block_match_motion_pallas(prev, curr, block=16, radius=4, interpret=True)
    )
    exp = np.asarray(block_match_motion(prev, curr, block=16, radius=4))
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_gray_pallas_matches_xla(rng):
    from rtvqa_tpu.kernels.gray_pallas import yuv420_to_gray_pallas
    from rtvqa_tpu.ops.color import yuv420_to_gray

    for h, w in ((96, 192), (67, 130), (128, 257)):
        y = rng.integers(0, 256, (3, h, w), dtype=np.uint8)
        u = rng.integers(0, 256, (3, -(-h // 2), -(-w // 2)), dtype=np.uint8)
        v = rng.integers(0, 256, (3, -(-h // 2), -(-w // 2)), dtype=np.uint8)
        got = np.asarray(yuv420_to_gray_pallas(y, u, v, interpret=True))
        want = np.asarray(yuv420_to_gray(y, u, v))
        # Identical expression; only fma-contraction ULPs may differ.
        np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("kb", [4, 23, 34])
def test_block_match_pallas_kb_override(rng, kb):
    # The round-5 strip-height knob: any kb must be numerically equivalent
    # (it only changes grid-cell geometry; ragged tails are masked).
    prev = rng.integers(0, 256, (2, 270, 256)).astype(np.float32)
    curr = np.stack(
        [np.roll(np.roll(prev[i], 2, 0), -1, 1) for i in range(2)]
    ).astype(np.float32)
    got = np.asarray(
        block_match_motion_pallas(
            prev, curr, block=8, radius=4, interpret=True, kb=kb
        )
    )
    exp = np.asarray(block_match_motion(prev, curr, block=8, radius=4))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_bm_grid_config_three_strip_target():
    # Round-5 default: when scoped-VMEM affords it, the grid targets 3
    # strips per band (measured win at 1080p half-res, neutral wider —
    # probes/KB23_AB_r05.json, probes/KB_WIDE_r05.json). Numerics of
    # explicit kb values are covered by test_block_match_pallas_kb_override.
    from rtvqa_tpu.kernels.motion_pallas import _bm_grid_config

    assert _bm_grid_config(960, 540, 8, 4) == (23, 3, 552)    # 1080p half
    assert _bm_grid_config(1280, 720, 8, 4) == (30, 3, 720)   # 1440p half
    # 4K half-res: target3=45 exceeds the VMEM budget cap (21) -> ladder.
    assert _bm_grid_config(1920, 1080, 8, 4) == (16, 9, 1152)
    # Full-res full-radius small-block stays at the kb=4 budget clamp.
    assert _bm_grid_config(1920, 1080, 16, 8)[0] == 4
    # Tiny frames keep the ladder (target3 < 16 never triggers).
    assert _bm_grid_config(128, 150, 8, 4) == (16, 2, 256)


@pytest.mark.parametrize("strip", [32, 128])
def test_gray_pallas_strip_override(rng, strip):
    from rtvqa_tpu.kernels.gray_pallas import yuv420_to_gray_pallas

    h, w = 200, 192
    y = rng.integers(0, 256, (2, h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (2, h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 256, (2, h // 2, w // 2), dtype=np.uint8)
    base = np.asarray(yuv420_to_gray_pallas(y, u, v, interpret=True))
    got = np.asarray(
        yuv420_to_gray_pallas(y, u, v, interpret=True, strip=strip)
    )
    np.testing.assert_array_equal(got, base)


def test_gray_pallas_small_frame_fallback(rng):
    # Below the int8 strip size the wrapper must route to the XLA form.
    from rtvqa_tpu.kernels.gray_pallas import yuv420_to_gray_pallas
    from rtvqa_tpu.ops.color import yuv420_to_gray

    y = rng.integers(0, 256, (2, 32, 48), dtype=np.uint8)
    u = rng.integers(0, 256, (2, 16, 24), dtype=np.uint8)
    v = rng.integers(0, 256, (2, 16, 24), dtype=np.uint8)
    got = np.asarray(yuv420_to_gray_pallas(y, u, v, interpret=True))
    want = np.asarray(yuv420_to_gray(y, u, v))
    # Same function, but jitted-vs-eager fma contraction may differ by ULPs.
    np.testing.assert_allclose(got, want, atol=1e-3)
