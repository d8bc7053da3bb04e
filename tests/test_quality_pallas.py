"""Fused VIF0+PSNR+SSIM+motion kernel vs the XLA implementations
(interpret mode — on-device parity is asserted by ``bench.py --validate``)."""

import numpy as np
import pytest

from rtvqa_tpu.metrics.quality import psnr_frames, ssim_frames
from rtvqa_tpu.vmaf.filters import decimate2, filter1d_sep, gaussian_kernel
from rtvqa_tpu.vmaf.motion import FILTER_5
from rtvqa_tpu.vmaf.vif import vif_features


def make_yuv(rng, b=2, h=56, w=70):
    h2, w2 = h // 2, w // 2
    ry = rng.integers(0, 256, (b, h, w), np.uint8)
    ru = rng.integers(0, 256, (b, h2, w2), np.uint8)
    rv = rng.integers(0, 256, (b, h2, w2), np.uint8)
    dy = np.clip(ry.astype(np.int16) + rng.integers(-9, 10, ry.shape), 0, 255).astype(np.uint8)
    du = np.clip(ru.astype(np.int16) + rng.integers(-9, 10, ru.shape), 0, 255).astype(np.uint8)
    dv = np.clip(rv.astype(np.int16) + rng.integers(-9, 10, rv.shape), 0, 255).astype(np.uint8)
    return ry, ru, rv, dy, du, dv


#  - (56, 70)/(40, 128): the 48 -> 24 strip fallback leg (strip + 16 > h)
#  - (24, 70): the final 24 -> 8 leg
#  - (64, 96): full 48-row strips
@pytest.mark.parametrize(
    "h,w", [(56, 70), (64, 96), (40, 128), (24, 70), (40, 2560)]
)
def test_fused_quality_kernel_matches_xla(rng, h, w):
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas

    ry, ru, rv, dy, du, dv = make_yuv(rng, b=2, h=h, w=w)
    prev_blur = np.asarray(
        filter1d_sep(rng.integers(0, 256, (h, w)).astype(np.float32), FILTER_5)
    )
    got = quality_fused_pallas(ry, ru, rv, dy, du, dv, prev_blur, interpret=True)

    # --- VIF scale 0 + decimated outputs -----------------------------------
    expected_vif = vif_features(ry.astype(np.float32), dy.astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(got["vif_scale0"]), np.asarray(expected_vif["vif_scale0"]),
        rtol=2e-4,
    )
    taps9 = gaussian_kernel(9, 9 / 5.0)
    for key, plane in (("dec_ref", ry), ("dec_dis", dy)):
        exp = np.asarray(decimate2(filter1d_sep(plane.astype(np.float32), taps9)))
        assert got[key].shape == exp.shape
        np.testing.assert_allclose(np.asarray(got[key]), exp, rtol=1e-4, atol=1e-3)

    # --- PSNR plane SSEs ----------------------------------------------------
    p = psnr_frames(ry, ru, rv, dy, du, dv)
    np.testing.assert_allclose(
        np.asarray(got["sse_y"]) / (h * w), np.asarray(p["mse_y"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["sse_u"]) / (h * w / 4), np.asarray(p["mse_u"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["sse_v"]) / (h * w / 4), np.asarray(p["mse_v"]), rtol=1e-6
    )

    # --- x264 SSIM plane scores --------------------------------------------
    s = ssim_frames(ry, ru, rv, dy, du, dv)
    n_win_y = (h // 4 - 1) * (w // 4 - 1)
    n_win_c = (h // 8 - 1) * (w // 8 - 1)
    np.testing.assert_allclose(
        np.asarray(got["ssim_y_sum"]) / n_win_y, np.asarray(s["ssim_y"]), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["ssim_u_sum"]) / n_win_c, np.asarray(s["ssim_u"]), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["ssim_v_sum"]) / n_win_c, np.asarray(s["ssim_v"]), atol=2e-6
    )

    # --- motion blur SAD + carry -------------------------------------------
    blurred = np.asarray(filter1d_sep(ry.astype(np.float32), FILTER_5))
    sad0 = np.abs(blurred[0] - prev_blur).mean()
    sad1 = np.abs(blurred[1] - blurred[0]).mean()
    got_sad = np.asarray(got["sad_sum"]) / (h * w)
    np.testing.assert_allclose(got_sad, [sad0, sad1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got["blur_carry"]), blurred[-1], rtol=1e-5, atol=1e-4
    )


def test_int_exact_pooling_bit_equal_to_highest(rng):
    """Round 4: uint8 inputs take the int-exact pooling path (2-3 native-bf16
    passes); f32-staged inputs take the 6-pass HIGHEST path. The SSIM sums
    are integer math — the two must agree BIT-FOR-BIT."""
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas

    ry, ru, rv, dy, du, dv = make_yuv(rng, b=2, h=56, w=70)
    prev_blur = np.zeros((56, 70), np.float32)
    got_int = quality_fused_pallas(
        ry, ru, rv, dy, du, dv, prev_blur, interpret=True
    )
    got_f32 = quality_fused_pallas(
        ry.astype(np.float32), ru.astype(np.float32), rv.astype(np.float32),
        dy.astype(np.float32), du.astype(np.float32), dv.astype(np.float32),
        prev_blur, interpret=True,
    )
    for key in ("ssim_y_sum", "ssim_u_sum", "ssim_v_sum", "sse_y", "sse_u",
                "sse_v"):
        np.testing.assert_array_equal(
            np.asarray(got_int[key]), np.asarray(got_f32[key]), err_msg=key
        )


def test_fused_quality_kernel_identity(rng):
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas

    ry, ru, rv, _, _, _ = make_yuv(rng, b=1, h=48, w=64)
    got = quality_fused_pallas(
        ry, ru, rv, ry, ru, rv, np.zeros((48, 64), np.float32), interpret=True
    )
    np.testing.assert_allclose(np.asarray(got["vif_scale0"]), 1.0, atol=1e-5)
    assert float(got["sse_y"][0]) == 0.0
    assert float(got["sse_u"][0]) == 0.0
    n_win_y = (48 // 4 - 1) * (64 // 4 - 1)
    np.testing.assert_allclose(
        np.asarray(got["ssim_y_sum"]) / n_win_y, 1.0, atol=1e-6
    )


def test_fused_quality_kernel_neg_gain_limit(rng):
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas

    ry = rng.integers(40, 200, (1, 48, 64)).astype(np.uint8)
    dy = np.clip((ry.astype(np.float32) - 128.0) * 1.4 + 128.0, 0, 255).astype(np.uint8)
    ru = rng.integers(0, 256, (1, 24, 32), np.uint8)
    got = quality_fused_pallas(
        ry, ru, ru, dy, ru, ru, np.zeros((48, 64), np.float32),
        egl=1.0, interpret=True,
    )
    expected = vif_features(
        ry.astype(np.float32), dy.astype(np.float32), enhn_gain_limit=1.0
    )
    np.testing.assert_allclose(
        np.asarray(got["vif_scale0"]), np.asarray(expected["vif_scale0"]), rtol=3e-4
    )


def test_fused_quality_kernel_fast3(rng):
    """FAST3 affects ONLY the VIF filter matmuls: SSE/SSIM/SAD outputs are
    bit-identical to the exact path (SSIM pooling stays HIGHEST), while the
    VIF quantities stay inside the documented error budget."""
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas

    ry, ru, rv, dy, du, dv = make_yuv(rng, b=2, h=56, w=70)
    prev_blur = np.zeros((56, 70), np.float32)
    exact = quality_fused_pallas(
        ry, ru, rv, dy, du, dv, prev_blur, interpret=True, fast3=False
    )
    fast = quality_fused_pallas(
        ry, ru, rv, dy, du, dv, prev_blur, interpret=True, fast3=True
    )
    for k in ("sse_y", "sse_u", "sse_v", "ssim_y_sum", "ssim_u_sum",
              "ssim_v_sum", "sad_sum", "blur_carry"):
        np.testing.assert_array_equal(
            np.asarray(fast[k]), np.asarray(exact[k]), err_msg=k
        )
    for k in ("vif_scale0", "dec_ref", "dec_dis"):
        a, b = np.asarray(fast[k]), np.asarray(exact[k])
        rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-6))
        assert rel < 2e-3, f"{k}: rel err {rel}"
    assert not np.array_equal(
        np.asarray(fast["vif_scale0"]), np.asarray(exact["vif_scale0"])
    )


@pytest.mark.parametrize("tall", [48, 64])
def test_fused_quality_kernel_tall_strips_match_default(rng, tall):
    """Round 5: ``wide_strip`` overrides at ANY width (the 1080p strip-height
    A/B needs strips taller than the 32-row default under the raised 64 MB
    scoped-VMEM budget). Taller strips only regroup the per-strip partial
    sums, so every scalar output matches the default tightly and the
    decimated planes match on the valid region."""
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas

    h, w = 160, 128
    ry, ru, rv, dy, du, dv = make_yuv(rng, b=2, h=h, w=w)
    prev_blur = np.asarray(
        filter1d_sep(rng.integers(0, 256, (h, w)).astype(np.float32), FILTER_5)
    )
    base = quality_fused_pallas(ry, ru, rv, dy, du, dv, prev_blur, interpret=True)
    got = quality_fused_pallas(
        ry, ru, rv, dy, du, dv, prev_blur, interpret=True, wide_strip=tall
    )
    hs, ws = (h + 1) // 2, (w + 1) // 2
    for key in base:
        b_v, g_v = np.asarray(base[key]), np.asarray(got[key])
        if key in ("dec_ref", "dec_dis"):
            b_v, g_v = b_v[:, :hs, :ws], g_v[:, :hs, :ws]
        elif key == "blur_carry":
            b_v, g_v = b_v[:h, :w], g_v[:h, :w]
        np.testing.assert_allclose(g_v, b_v, rtol=1e-5, atol=1e-4, err_msg=key)
