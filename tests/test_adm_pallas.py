"""Fused Pallas ADM scale-0 kernel vs the XLA implementation (interpret mode)."""

import numpy as np
import pytest

from rtvqa_tpu.vmaf.adm import adm_features, adm_one_scale


def make_pair(rng, b=2, h=64, w=96, noise=8):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        110
        + 60 * np.sin(2 * np.pi * xx / 37.0)
        + 40 * np.cos(2 * np.pi * (xx + 2 * yy) / 53.0)
    )
    ref = np.stack(
        [np.clip(base + rng.normal(0, 10, (h, w)), 0, 255) for _ in range(b)]
    ).astype(np.float32)
    dis = np.clip(ref + rng.normal(0, noise, ref.shape), 0, 255).astype(np.float32)
    return ref, dis


def test_adm0_kernel_matches_xla(rng):
    from rtvqa_tpu.kernels.adm_pallas import adm_scale0_pallas

    ref, dis = make_pair(rng)
    num, den, a_ref, a_dis = adm_scale0_pallas(ref, dis, interpret=True)
    exp_o, exp_t, exp_num, exp_den = adm_one_scale(ref, dis, 0)
    np.testing.assert_allclose(np.asarray(num), np.asarray(exp_num), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(den), np.asarray(exp_den), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(a_ref), np.asarray(exp_o), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(a_dis), np.asarray(exp_t), rtol=1e-4, atol=1e-3
    )


@pytest.mark.parametrize("h,w", [(53, 71), (40, 64), (67, 96), (135, 240)])
def test_adm0_kernel_ragged_and_odd_dims(rng, h, w):
    """Odd dims + H2 % STRIP != 0 (the 1080p case: 540 % 16 == 12)."""
    from rtvqa_tpu.kernels.adm_pallas import adm_scale0_pallas

    ref, dis = make_pair(rng, b=1, h=h, w=w)
    num, den, a_ref, a_dis = adm_scale0_pallas(ref, dis, interpret=True)
    exp_o, exp_t, exp_num, exp_den = adm_one_scale(ref, dis, 0)
    np.testing.assert_allclose(np.asarray(num), np.asarray(exp_num), rtol=3e-4)
    np.testing.assert_allclose(np.asarray(den), np.asarray(exp_den), rtol=3e-4)
    assert a_ref.shape == exp_o.shape
    np.testing.assert_allclose(
        np.asarray(a_ref), np.asarray(exp_o), rtol=1e-4, atol=1e-3
    )


def test_adm_features_pallas_full(rng):
    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas

    ref, dis = make_pair(rng, b=1, h=96, w=128)
    got = float(np.asarray(adm_features_pallas(ref, dis)["adm2"])[0])
    exp = float(np.asarray(adm_features(ref, dis)["adm2"])[0])
    assert got == pytest.approx(exp, rel=2e-4)

    # Identity: adm2 == 1 exactly through the kernel too.
    ident = float(np.asarray(adm_features_pallas(ref, ref)["adm2"])[0])
    assert ident == pytest.approx(1.0, abs=1e-4)


def test_adm_features_pallas_tall_strips(rng):
    """Tall narrow frames exercise the round-3 adaptive strip sizes
    (w < 640 -> up to 128 subband rows per cell, ragged last strip)."""
    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas
    from rtvqa_tpu.vmaf.adm import adm_features

    ref, dis = make_pair(rng, b=1, h=280, w=256)
    got = adm_features_pallas(ref, dis)
    expected = adm_features(ref, dis)
    np.testing.assert_allclose(
        np.asarray(got["adm2"]), np.asarray(expected["adm2"]), rtol=3e-4
    )


def test_adm_features_pallas_neg_gain_limit(rng):
    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas

    ref, _ = make_pair(rng, b=1, h=96, w=128)
    enhanced = np.clip((ref - ref.mean()) * 1.4 + ref.mean(), 0, 255).astype(np.float32)
    got = float(
        np.asarray(adm_features_pallas(ref, enhanced, enhn_gain_limit=1.0)["adm2"])[0]
    )
    exp = float(
        np.asarray(adm_features(ref, enhanced, enhn_gain_limit=1.0)["adm2"])[0]
    )
    assert got == pytest.approx(exp, rel=2e-4)


def test_adm_tail_matches_chain(rng):
    """The per-frame scales-1..3 tail kernel (round 4) must agree with the
    chained per-scale strip kernels AND the XLA oracle."""
    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas

    ref, dis = make_pair(rng, b=2, h=96, w=128)
    got_tail = float(np.asarray(adm_features_pallas(ref, dis, tail=True)["adm2"])[0])
    got_chain = float(np.asarray(adm_features_pallas(ref, dis, tail=False)["adm2"])[0])
    exp = float(np.asarray(adm_features(ref, dis)["adm2"])[0])
    assert got_tail == pytest.approx(exp, rel=2e-4)
    assert got_tail == pytest.approx(got_chain, rel=1e-5)


@pytest.mark.parametrize("h,w", [(53, 71), (135, 240), (108, 192)])
def test_adm_tail_odd_dims(rng, h, w):
    """Odd/ragged dims through the tail kernel (chunk masking + reflect
    borders at every scale; 135x240 is the 1080p scale-3 geometry)."""
    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas

    ref, dis = make_pair(rng, b=1, h=h, w=w)
    got = float(np.asarray(adm_features_pallas(ref, dis, tail=True)["adm2"])[0])
    exp = float(np.asarray(adm_features(ref, dis)["adm2"])[0])
    assert got == pytest.approx(exp, rel=3e-4)


def test_adm_tail_neg_gain_limit(rng):
    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas

    ref, _ = make_pair(rng, b=1, h=96, w=128)
    enhanced = np.clip(
        (ref - ref.mean()) * 1.4 + ref.mean(), 0, 255
    ).astype(np.float32)
    got = float(np.asarray(
        adm_features_pallas(ref, enhanced, enhn_gain_limit=1.0, tail=True)["adm2"]
    )[0])
    exp = float(np.asarray(
        adm_features(ref, enhanced, enhn_gain_limit=1.0)["adm2"]
    )[0])
    assert got == pytest.approx(exp, rel=2e-4)


def test_adm_pallas_uint8_inputs_match_f32(rng):
    """Raw uint8 inputs (round 3i: int8-bitcast DMA + in-VMEM value rebuild)
    must equal the f32-input path exactly (the conversion is exact and the
    kernel arithmetic identical)."""
    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas

    ref, dis = make_pair(rng, b=2, h=56, w=96)
    ref8 = ref.astype(np.uint8)
    dis8 = dis.astype(np.uint8)
    got8 = adm_features_pallas(ref8, dis8)
    got32 = adm_features_pallas(
        ref8.astype(np.float32), dis8.astype(np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(got8["adm2"]), np.asarray(got32["adm2"])
    )


def test_adm_pallas_uint8_wide_width_gate(rng):
    """Widths > 2048 lanes route uint8 inputs back to f32 staging (the
    raw-int8 in-VMEM rebuild overflows the 16 MB scoped-VMEM stack budget
    at 4K — measured 21.9 MB). Results must still equal the f32 path."""
    from rtvqa_tpu.kernels.adm_pallas import adm_scale_pallas

    ref, dis = make_pair(rng, b=1, h=40, w=2176)
    ref8 = ref.astype(np.uint8)
    dis8 = dis.astype(np.uint8)
    n8, d8, _, _ = adm_scale_pallas(ref8, dis8, 0, interpret=True)
    n32, d32, _, _ = adm_scale_pallas(
        ref8.astype(np.float32), dis8.astype(np.float32), 0, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(n8), np.asarray(n32))
    np.testing.assert_array_equal(np.asarray(d8), np.asarray(d32))
