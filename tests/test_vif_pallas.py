"""Fused Pallas VIF scale-0 kernel vs the XLA implementation (interpret mode)."""

import numpy as np
import pytest

from rtvqa_tpu.vmaf.filters import decimate2, filter1d_sep, gaussian_kernel
from rtvqa_tpu.vmaf.vif import vif_features


def make_pair(rng, b=2, h=48, w=70):
    ref = rng.integers(0, 256, (b, h, w)).astype(np.float32)
    dis = np.clip(ref + rng.normal(0, 8, ref.shape), 0, 255).astype(np.float32)
    return ref, dis


def test_vif0_kernel_matches_xla(rng):
    from rtvqa_tpu.kernels.vif_pallas import vif_scale0_pallas

    ref, dis = make_pair(rng)
    vif0, dec_ref, dec_dis = vif_scale0_pallas(ref, dis, interpret=True)
    expected = vif_features(ref, dis)
    np.testing.assert_allclose(
        np.asarray(vif0), np.asarray(expected["vif_scale0"]), rtol=2e-4
    )
    taps9 = gaussian_kernel(9, 9 / 5.0)
    exp_dec = np.asarray(decimate2(filter1d_sep(ref, taps9)))
    np.testing.assert_allclose(np.asarray(dec_ref), exp_dec, rtol=1e-4, atol=1e-3)
    exp_dec_d = np.asarray(decimate2(filter1d_sep(dis, taps9)))
    np.testing.assert_allclose(np.asarray(dec_dis), exp_dec_d, rtol=1e-4, atol=1e-3)


def test_vif_features_pallas_all_scales(rng):
    from rtvqa_tpu.kernels.vif_pallas import vif_features_pallas

    ref, dis = make_pair(rng, b=1, h=64, w=96)
    got = vif_features_pallas(ref, dis)
    expected = vif_features(ref, dis)
    for k in range(4):
        np.testing.assert_allclose(
            np.asarray(got[f"vif_scale{k}"]),
            np.asarray(expected[f"vif_scale{k}"]),
            rtol=3e-4,
        )


@pytest.mark.parametrize("h,w", [(64, 96), (56, 70), (130, 170)])
def test_vif_tail_kernel_matches_chain(rng, h, w):
    """Round 4: the per-frame scales-1..3 tail kernel must match the chained
    per-scale strip kernels (same filters, same fast3 gating) AND the XLA
    oracle, including ragged/odd dims and block-padded inputs."""
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas
    from rtvqa_tpu.kernels.vif_pallas import vif_scale_pallas, vif_tail_pallas

    ref, dis = make_pair(rng, b=2, h=h, w=w)
    expected = vif_features(ref, dis)

    # Block-padded inputs straight from the fused scale-0 kernel (crop=False),
    # exactly as _chunk_fused_tpu chains them.
    ry = ref.astype(np.uint8)
    dy = dis.astype(np.uint8)
    expected_u8 = vif_features(
        ry.astype(np.float32), dy.astype(np.float32)
    )
    h2, w2 = h // 2, w // 2
    ru = rng.integers(0, 256, (2, h2, w2), np.uint8)
    fq = quality_fused_pallas(
        ry, ru, ru, dy, ru, ru, np.zeros((h, w), np.float32),
        interpret=True, crop=False, fast3=False,
    )
    hs, ws = (h + 1) // 2, (w + 1) // 2
    got = vif_tail_pallas(
        fq["dec_ref"], fq["dec_dis"], interpret=True, fast3=False,
        h=hs, w=ws,
    )
    # Chained per-scale kernels on the same inputs — near-identical math
    # (matmul association may differ at f32 ULP level).
    r_c, d_c = fq["dec_ref"], fq["dec_dis"]
    chain = {}
    hh, www = hs, ws
    for scale in (1, 2, 3):
        v, r_c, d_c = vif_scale_pallas(
            r_c, d_c, scale, interpret=True, fast3=False, h=hh, w=www,
            crop=False,
        )
        hh, www = (hh + 1) // 2, (www + 1) // 2
        chain[f"vif_scale{scale}"] = v
    for k in (1, 2, 3):
        key = f"vif_scale{k}"
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(chain[key]), rtol=1e-5,
            err_msg=f"{key} tail vs chain",
        )
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(expected_u8[key]), rtol=3e-4,
            err_msg=f"{key} tail vs oracle",
        )


@pytest.mark.parametrize("h,w", [(64, 96), (56, 70), (130, 170)])
def test_vif_tail_raw_matches_dec_input_tail(rng, h, w):
    """Round 4b: the raw-luma tail (in-kernel scale-1 decimation,
    quality_fused_pallas(emit_dec=False) peer) must match the dec-input
    tail fed by the fused kernel's stage 6 to f32 sum-order noise (the
    decimation is the same band structure either way; raw mode chunks
    scale 1 at ch=32 vs 64, reordering the num/den partial sums) — and
    the XLA oracle."""
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas
    from rtvqa_tpu.kernels.vif_pallas import vif_tail_pallas

    ref, dis = make_pair(rng, b=2, h=h, w=w)
    ry = ref.astype(np.uint8)
    dy = dis.astype(np.uint8)
    expected = vif_features(ry.astype(np.float32), dy.astype(np.float32))

    got_raw = vif_tail_pallas(
        ry, dy, interpret=True, fast3=False, h=h, w=w, raw=True
    )
    h2, w2 = h // 2, w // 2
    ru = rng.integers(0, 256, (2, h2, w2), np.uint8)
    fq = quality_fused_pallas(
        ry, ru, ru, dy, ru, ru, np.zeros((h, w), np.float32),
        interpret=True, crop=False, fast3=False,
    )
    got_dec = vif_tail_pallas(
        fq["dec_ref"], fq["dec_dis"], interpret=True, fast3=False,
        h=(h + 1) // 2, w=(w + 1) // 2,
    )
    for k in (1, 2, 3):
        key = f"vif_scale{k}"
        np.testing.assert_allclose(
            np.asarray(got_raw[key]), np.asarray(got_dec[key]), rtol=1e-5,
            err_msg=f"{key} raw tail vs dec-input tail",
        )
        np.testing.assert_allclose(
            np.asarray(got_raw[key]), np.asarray(expected[key]), rtol=3e-4,
            err_msg=f"{key} raw tail vs oracle",
        )


def test_fused_quality_emit_dec_false_matches(rng):
    """emit_dec=False must leave every scalar output identical (the dec
    stage only feeds the dec outputs)."""
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas

    ref, dis = make_pair(rng, b=2, h=64, w=96)
    ry, dy = ref.astype(np.uint8), dis.astype(np.uint8)
    ru = rng.integers(0, 256, (2, 32, 48), np.uint8)
    full = quality_fused_pallas(
        ry, ru, ru, dy, ru, ru, np.zeros((64, 96), np.float32),
        interpret=True, fast3=False,
    )
    lean = quality_fused_pallas(
        ry, ru, ru, dy, ru, ru, np.zeros((64, 96), np.float32),
        interpret=True, fast3=False, emit_dec=False,
    )
    assert "dec_ref" not in lean
    for k in ("vif_scale0", "sse_y", "sse_u", "sse_v", "ssim_y_sum",
              "ssim_u_sum", "ssim_v_sum", "sad_sum"):
        np.testing.assert_array_equal(
            np.asarray(full[k]), np.asarray(lean[k]), err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(full["blur_carry"]), np.asarray(lean["blur_carry"])
    )


def test_vif_tail_kernel_fast3_tracks_exact(rng):
    from rtvqa_tpu.kernels.vif_pallas import vif_scale0_pallas, vif_tail_pallas

    ref, dis = make_pair(rng, b=1, h=64, w=96)
    _, dec_r, dec_d = vif_scale0_pallas(ref, dis, interpret=True)
    exact = vif_tail_pallas(dec_r, dec_d, interpret=True, fast3=False)
    fast = vif_tail_pallas(dec_r, dec_d, interpret=True, fast3=True)
    for k in (1, 2, 3):
        np.testing.assert_allclose(
            np.asarray(fast[f"vif_scale{k}"]),
            np.asarray(exact[f"vif_scale{k}"]), rtol=6e-4,
        )


@pytest.mark.parametrize("h,w", [(56, 70), (53, 71), (40, 64)])
def test_vif0_kernel_ragged_height(rng, h, w):
    """H % 16 != 0 (the 1080p case: 1080 % 16 == 8) and odd dims."""
    from rtvqa_tpu.kernels.vif_pallas import vif_scale0_pallas

    ref, dis = make_pair(rng, b=1, h=h, w=w)
    vif0, dec_ref, dec_dis = vif_scale0_pallas(ref, dis, interpret=True)
    expected = vif_features(ref, dis)
    np.testing.assert_allclose(
        np.asarray(vif0), np.asarray(expected["vif_scale0"]), rtol=2e-4
    )
    taps9 = gaussian_kernel(9, 9 / 5.0)
    exp_dec = np.asarray(decimate2(filter1d_sep(ref, taps9)))
    assert dec_ref.shape == exp_dec.shape
    np.testing.assert_allclose(np.asarray(dec_ref), exp_dec, rtol=1e-4, atol=1e-3)
    exp_dec_d = np.asarray(decimate2(filter1d_sep(dis, taps9)))
    np.testing.assert_allclose(np.asarray(dec_dis), exp_dec_d, rtol=1e-4, atol=1e-3)


def test_vif_features_pallas_ragged_all_scales(rng):
    from rtvqa_tpu.kernels.vif_pallas import vif_features_pallas

    ref, dis = make_pair(rng, b=1, h=56, w=70)
    got = vif_features_pallas(ref, dis)
    expected = vif_features(ref, dis)
    for k in range(4):
        np.testing.assert_allclose(
            np.asarray(got[f"vif_scale{k}"]),
            np.asarray(expected[f"vif_scale{k}"]),
            rtol=3e-4,
        )


def test_vif_features_pallas_tall_strips(rng):
    """Narrow frames use 64/128-row strips (round-3 adaptive strip sizing);
    cover the taller-strip kernels incl. a ragged last strip."""
    from rtvqa_tpu.kernels.vif_pallas import vif_features_pallas

    ref, dis = make_pair(rng, b=1, h=140, w=256)
    got = vif_features_pallas(ref, dis)
    expected = vif_features(ref, dis)
    for k in range(4):
        np.testing.assert_allclose(
            np.asarray(got[f"vif_scale{k}"]),
            np.asarray(expected[f"vif_scale{k}"]),
            rtol=3e-4,
        )


def test_vif_pallas_neg_gain_limit(rng):
    """NEG mode (vif_enhn_gain_limit) inside the fused kernel matches the XLA
    formulation, and actually bites on enhanced content (ADVICE r2 #1)."""
    from rtvqa_tpu.kernels.vif_pallas import vif_features_pallas

    ref = rng.integers(40, 200, (2, 56, 70)).astype(np.float32)
    # Contrast enhancement: gain > 1 windows everywhere, so the cap matters.
    dis = np.clip((ref - 128.0) * 1.4 + 128.0 + rng.normal(0, 2, ref.shape), 0, 255)
    dis = dis.astype(np.float32)
    got = vif_features_pallas(ref, dis, enhn_gain_limit=1.0)
    expected = vif_features(ref, dis, enhn_gain_limit=1.0)
    uncapped = vif_features(ref, dis)
    for k in range(4):
        np.testing.assert_allclose(
            np.asarray(got[f"vif_scale{k}"]),
            np.asarray(expected[f"vif_scale{k}"]),
            rtol=3e-4,
        )
    assert np.asarray(got["vif_scale0"]).mean() < np.asarray(
        uncapped["vif_scale0"]
    ).mean() - 1e-3


def test_vif_fast3_tracks_exact(rng):
    """FAST3 (manual 3-pass bf16 filter matmuls, auto-gated to scales <= 1)
    tracks the exact HIGHEST path within the documented feature-error budget
    (docs/PARITY.md: ~5e-4 end-to-end)."""
    from rtvqa_tpu.kernels.vif_pallas import vif_features_pallas

    ref, dis = make_pair(rng, b=2, h=64, w=96)
    exact = vif_features_pallas(ref, dis, fast3=False)
    fast = vif_features_pallas(ref, dis, fast3=True)
    for k in range(4):
        a = np.asarray(fast[f"vif_scale{k}"])
        b = np.asarray(exact[f"vif_scale{k}"])
        rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-9))
        assert rel < 2e-3, f"scale {k}: rel err {rel}"
    # The scheme is not a no-op: scale 0 must actually differ from exact at
    # the bf16-residual level (guards against fast3 silently not engaging).
    assert not np.array_equal(
        np.asarray(fast["vif_scale0"]), np.asarray(exact["vif_scale0"])
    )


def test_resolve_fast3_policy(monkeypatch):
    """Auto policy: exact on CPU (this suite), explicit caller wins."""
    import rtvqa_tpu.kernels.vif_pallas as vp

    assert vp.resolve_fast3(True) is True
    assert vp.resolve_fast3(False) is False
    monkeypatch.setattr(vp, "_ENV_PREC", None)
    import jax

    expected = jax.default_backend() != "cpu"
    assert vp.resolve_fast3(None) is expected


def test_vif_features_pallas_identity(rng):
    from rtvqa_tpu.kernels.vif_pallas import vif_features_pallas

    ref, _ = make_pair(rng, b=1, h=32, w=48)
    got = vif_features_pallas(ref, ref)
    for k in range(4):
        np.testing.assert_allclose(np.asarray(got[f"vif_scale{k}"]), 1.0, atol=1e-5)


def test_vif_pallas_uint8_inputs_match_f32(rng):
    """Raw uint8 inputs (round 3i: int8-bitcast DMA + in-VMEM value rebuild)
    must equal the f32-input path exactly — the uint8->f32 conversion is
    exact in both placements and the kernel arithmetic is identical."""
    from rtvqa_tpu.kernels.vif_pallas import vif_features_pallas

    ref8 = rng.integers(0, 256, (2, 52, 70), dtype=np.uint8)
    dis8 = np.clip(
        ref8.astype(np.int16) + rng.integers(-9, 10, ref8.shape), 0, 255
    ).astype(np.uint8)
    got8 = vif_features_pallas(ref8, dis8)
    got32 = vif_features_pallas(
        ref8.astype(np.float32), dis8.astype(np.float32)
    )
    for k in range(4):
        np.testing.assert_array_equal(
            np.asarray(got8[f"vif_scale{k}"]), np.asarray(got32[f"vif_scale{k}"])
        )


def test_vif_pallas_mixed_dtype_pair_falls_back(rng):
    """uint8 ref + float dis (e.g. probe variants) must unify to the f32
    staging path — shared VMEM scratch requires one dtype per input group."""
    from rtvqa_tpu.kernels.vif_pallas import vif_scale0_pallas

    ref8 = rng.integers(0, 256, (1, 48, 64), dtype=np.uint8)
    disf = np.clip(
        ref8.astype(np.float32) + rng.normal(0, 5, ref8.shape), 0, 255
    ).astype(np.float32)
    v_mixed, _, _ = vif_scale0_pallas(ref8, disf, interpret=True)
    v_f32, _, _ = vif_scale0_pallas(ref8.astype(np.float32), disf, interpret=True)
    np.testing.assert_array_equal(np.asarray(v_mixed), np.asarray(v_f32))
