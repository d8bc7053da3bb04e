import json

import numpy as np
import pytest

from rtvqa_tpu.vmaf.adm import adm_features
from rtvqa_tpu.vmaf.model import builtin_model, load_model
from rtvqa_tpu.vmaf.motion import motion_features
from rtvqa_tpu.vmaf.vif import vif_features, vif_features_np


def natural_image(h=72, w=96, seed=3):
    """Smooth structured content + texture (more VIF-meaningful than noise)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        110
        + 60 * np.sin(2 * np.pi * xx / 37.0)
        + 40 * np.cos(2 * np.pi * (xx + 2 * yy) / 53.0)
        + rng.normal(0, 12, (h, w))
    )
    return np.clip(img, 0, 255).astype(np.float32)


def blur3(x):
    acc = np.zeros_like(x)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc += np.roll(np.roll(x, dy, 0), dx, 1)
    return acc / 9.0


# --- VIF -------------------------------------------------------------------


def test_vif_identity_is_one():
    img = natural_image()
    out = vif_features(img[None], img[None])
    for k in range(4):
        assert float(np.asarray(out[f"vif_scale{k}"])[0]) == pytest.approx(1.0, abs=1e-5)


def test_vif_matches_numpy_oracle():
    ref = natural_image()
    rng = np.random.default_rng(0)
    dis = np.clip(ref + rng.normal(0, 8, ref.shape), 0, 255).astype(np.float32)
    got = vif_features(ref[None], dis[None])
    exp = vif_features_np(ref, dis)
    for k in range(4):
        assert float(np.asarray(got[f"vif_scale{k}"])[0]) == pytest.approx(
            exp[f"vif_scale{k}"], abs=2e-4
        )


def test_vif_monotone_in_noise():
    ref = natural_image()
    rng = np.random.default_rng(1)
    noise = rng.normal(0, 1, ref.shape)
    v_light = vif_features(ref[None], np.clip(ref + 4 * noise, 0, 255).astype(np.float32)[None])
    v_heavy = vif_features(ref[None], np.clip(ref + 25 * noise, 0, 255).astype(np.float32)[None])
    for k in range(4):
        lite = float(np.asarray(v_light[f"vif_scale{k}"])[0])
        heavy = float(np.asarray(v_heavy[f"vif_scale{k}"])[0])
        assert heavy < lite < 1.0 + 1e-6


# --- ADM -------------------------------------------------------------------


def test_adm_identity_is_one():
    img = natural_image(96, 128)
    out = adm_features(img[None], img[None])
    assert float(np.asarray(out["adm2"])[0]) == pytest.approx(1.0, abs=1e-4)


def test_adm_blur_loses_detail():
    ref = natural_image(96, 128)
    dis = blur3(blur3(ref)).astype(np.float32)
    out = adm_features(ref[None], dis[None])
    val = float(np.asarray(out["adm2"])[0])
    assert 0.2 < val < 0.999


def test_adm_additive_noise_mostly_ignored():
    # DLM decouples additive impairments: noise should hurt adm2 far less
    # than detail loss of comparable MSE.
    ref = natural_image(96, 128)
    rng = np.random.default_rng(2)
    noisy = np.clip(ref + rng.normal(0, 10, ref.shape), 0, 255).astype(np.float32)
    blurred = blur3(blur3(ref)).astype(np.float32)
    adm_noise = float(np.asarray(adm_features(ref[None], noisy[None])["adm2"])[0])
    adm_blur = float(np.asarray(adm_features(ref[None], blurred[None])["adm2"])[0])
    assert adm_noise > adm_blur


# --- motion ----------------------------------------------------------------


def test_motion_static_zero():
    img = natural_image()
    clip = np.stack([img] * 4)
    out = motion_features(clip)
    np.testing.assert_allclose(np.asarray(out["motion"]), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["motion2"]), 0.0, atol=1e-4)


def test_motion_shift_positive_and_min_rule():
    img = natural_image()
    clip = np.stack([np.roll(img, i * 2, axis=1) for i in range(4)])
    out = motion_features(clip)
    motion = np.asarray(out["motion"])
    motion2 = np.asarray(out["motion2"])
    assert motion[0] == 0.0
    assert np.all(motion[1:] > 1.0)
    assert np.all(motion2 <= motion + 1e-6)
    # Last frame's motion2 equals its backward motion (no next frame).
    assert motion2[-1] == pytest.approx(motion[-1], abs=1e-6)


# --- model -----------------------------------------------------------------


def perfect_features(n=3, motion=0.0):
    return {
        "adm2": np.ones(n, np.float32),
        "motion2": np.full(n, motion, np.float32),
        "vif_scale0": np.ones(n, np.float32),
        "vif_scale1": np.ones(n, np.float32),
        "vif_scale2": np.ones(n, np.float32),
        "vif_scale3": np.ones(n, np.float32),
    }


def test_builtin_model_identity_scores_100():
    m = builtin_model()
    scores = np.asarray(m.predict(perfect_features()))
    np.testing.assert_allclose(scores, 100.0, atol=0.5)


def test_builtin_model_monotone():
    m = builtin_model()
    good = perfect_features()
    bad = dict(good, adm2=np.full(3, 0.6, np.float32), vif_scale3=np.full(3, 0.5, np.float32))
    assert float(np.asarray(m.predict(bad))[0]) < float(np.asarray(m.predict(good))[0])


def test_load_libvmaf_json_rbf(tmp_path):
    # Synthetic model in the official libvmaf JSON layout with a libsvm blob;
    # verify the RBF nu-SVR evaluation against a direct NumPy computation.
    sv = np.array([[0.2, 0.1, 0.5, 0.6, 0.7, 0.8], [0.9, 0.0, 0.9, 0.9, 0.9, 0.9]])
    coef = np.array([1.5, -0.7])
    gamma, rho = 0.04, -0.3
    blob_lines = ["svm_type nu_svr", "kernel_type rbf", f"gamma {gamma}", "nr_class 2",
                  "total_sv 2", f"rho {rho}", "SV"]
    for c, row in zip(coef, sv):
        blob_lines.append(
            f"{c} " + " ".join(f"{i+1}:{val}" for i, val in enumerate(row))
        )
    slopes = [0.012, 1.0, 0.05, 1.1, 1.2, 1.3, 1.4]
    intercepts = [-0.3, 0.0, 0.01, -0.1, -0.2, -0.3, -0.4]
    model_json = {
        "version": "test_0.1",
        "model_dict": {
            "model_type": "LIBSVMNUSVR",
            "feature_names": [
                "VMAF_feature_adm2_score",
                "VMAF_feature_motion2_score",
                "VMAF_feature_vif_scale0_score",
                "VMAF_feature_vif_scale1_score",
                "VMAF_feature_vif_scale2_score",
                "VMAF_feature_vif_scale3_score",
            ],
            "slopes": slopes,
            "intercepts": intercepts,
            "score_clip": [0.0, 100.0],
            "model": "\n".join(blob_lines),
        },
    }
    p = tmp_path / "model.json"
    p.write_text(json.dumps(model_json))
    m = load_model(str(p))
    assert m.kind == "rbf_nusvr"
    assert m.gamma == gamma

    feats = perfect_features(n=2, motion=3.0)
    got = np.asarray(m.predict(feats))

    x = np.array([1.0, 3.0, 1.0, 1.0, 1.0, 1.0])
    xn = x * np.array(slopes[1:]) + np.array(intercepts[1:])
    k = np.exp(-gamma * ((xn[None, :] - sv) ** 2).sum(-1))
    y = (k * coef).sum() - rho
    expected = np.clip((y - intercepts[0]) / slopes[0], 0, 100)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_compute_vmaf_end_to_end():
    from rtvqa_tpu.vmaf.predictor import compute_vmaf

    class FakeClip:
        def __init__(self, y):
            self.y = y

    rng = np.random.default_rng(4)
    base = natural_image(64, 96)
    frames = np.stack([np.roll(base, i, 1) for i in range(5)]).astype(np.uint8)
    ref = FakeClip(frames)
    noisy = FakeClip(
        np.clip(frames.astype(np.int16) + rng.integers(-20, 21, frames.shape), 0, 255).astype(np.uint8)
    )
    s_ident = compute_vmaf(ref, ref)
    s_noisy = compute_vmaf(ref, noisy)
    assert s_ident > 95.0
    assert s_noisy < s_ident


def test_adm_matches_numpy_oracle():
    from tests.oracles.adm import adm2 as adm2_oracle

    ref = natural_image(96, 128, seed=7)
    dis = blur3(ref).astype(np.float32)
    got = float(np.asarray(adm_features(ref[None], dis[None])["adm2"])[0])
    expected = adm2_oracle(ref, dis)
    assert got == pytest.approx(expected, rel=5e-4)


def _neg_model_json(tmp_path):
    """Minimal real-format model JSON with NEG feature options."""
    sv = np.array([[0.2, 0.1, 0.5, 0.6, 0.7, 0.8]])
    blob = "\n".join(
        ["svm_type nu_svr", "kernel_type rbf", "gamma 0.04", "total_sv 1",
         "rho -0.3", "SV",
         "1.0 " + " ".join(f"{i+1}:{v}" for i, v in enumerate(sv[0]))]
    )
    model_json = {
        "version": "test_neg_0.1",
        "model_dict": {
            "model_type": "LIBSVMNUSVR",
            "feature_names": [
                "VMAF_feature_adm2_score",
                "VMAF_feature_motion2_score",
                "VMAF_feature_vif_scale0_score",
                "VMAF_feature_vif_scale1_score",
                "VMAF_feature_vif_scale2_score",
                "VMAF_feature_vif_scale3_score",
            ],
            "feature_opts_dicts": [
                {"adm_enhn_gain_limit": 1.0},
                {},
                {"vif_enhn_gain_limit": 1.0},
                {"vif_enhn_gain_limit": 1.0},
                {"vif_enhn_gain_limit": 1.0},
                {"vif_enhn_gain_limit": 1.0},
            ],
            "slopes": [0.01, 1, 0.05, 1, 1, 1, 1],
            "intercepts": [0.0, 0, 0, 0, 0, 0, 0],
            "score_clip": [0.0, 100.0],
            "model": blob,
        },
    }
    p = tmp_path / "neg.json"
    p.write_text(json.dumps(model_json))
    return str(p)


def test_load_neg_model_feature_opts(tmp_path):
    m = load_model(_neg_model_json(tmp_path))
    assert m.vif_enhn_gain_limit == 1.0
    assert m.adm_enhn_gain_limit == 1.0
    # A classic model has no limits.
    assert builtin_model().vif_enhn_gain_limit is None


def test_vif_enhn_gain_limit_caps_enhancement():
    """NEG mode: contrast enhancement must not raise VIF (gain capped at 1);
    identity stays exactly 1.0; plain distortion is unaffected."""
    ref = natural_image()
    enhanced = np.clip((ref - ref.mean()) * 1.4 + ref.mean(), 0, 255).astype(np.float32)

    classic = vif_features(ref[None], enhanced[None])
    neg = vif_features(ref[None], enhanced[None], enhn_gain_limit=1.0)
    for k in range(4):
        c = float(np.asarray(classic[f"vif_scale{k}"])[0])
        n = float(np.asarray(neg[f"vif_scale{k}"])[0])
        assert n <= c + 1e-6
    assert float(np.asarray(neg["vif_scale0"])[0]) < float(
        np.asarray(classic["vif_scale0"])[0]
    )

    ident = vif_features(ref[None], ref[None], enhn_gain_limit=1.0)
    for k in range(4):
        assert float(np.asarray(ident[f"vif_scale{k}"])[0]) == pytest.approx(1.0, abs=1e-5)


def test_adm_enhn_gain_limit_caps_enhancement():
    ref = natural_image(96, 128)
    enhanced = np.clip((ref - ref.mean()) * 1.4 + ref.mean(), 0, 255).astype(np.float32)
    classic = float(np.asarray(adm_features(ref[None], enhanced[None])["adm2"])[0])
    neg = float(
        np.asarray(
            adm_features(ref[None], enhanced[None], enhn_gain_limit=1.0)["adm2"]
        )[0]
    )
    assert neg < classic + 1e-6
    ident = float(
        np.asarray(adm_features(ref[None], ref[None], enhn_gain_limit=1.0)["adm2"])[0]
    )
    assert ident == pytest.approx(1.0, abs=1e-4)


def test_model_score_transform(tmp_path):
    # Polynomial score transform (as used by e.g. vmaf_v0.6.1neg variants).
    m = builtin_model()
    import dataclasses as dc

    mt = dc.replace(m, score_transform=(1.0, 0.5, 0.001), score_clip=(0.0, 100.0))
    feats = perfect_features()
    base = float(np.asarray(m.predict(feats))[0])
    transformed = float(np.asarray(mt.predict(feats))[0])
    assert transformed == pytest.approx(min(1.0 + 0.5 * base + 0.001 * base**2, 100.0), rel=1e-5)
