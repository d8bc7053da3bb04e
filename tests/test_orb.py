import numpy as np
import pytest

from rtvqa_tpu.ops import orb as jorb
from tests.oracles import orb as oracle


def corner_image(h=64, w=64):
    """Bright squares on a gradient background -> strong, tie-free FAST corners.

    The gradient breaks the score ties a perfectly symmetric pattern would
    produce (strict 3x3 NMS — like cv2's — suppresses tied plateaus entirely).
    """
    yy, xx = np.mgrid[0:h, 0:w]
    img = (yy * 0.37 + xx * 0.23).astype(np.float32)
    for k, (cy, cx) in enumerate([(16, 16), (16, 44), (44, 16), (44, 44), (31, 31)]):
        img[cy - 5 : cy + 5, cx - 5 : cx + 5] = 200.0 + 7.0 * k
    return img


def test_fast_score_matches_oracle():
    img = corner_image()
    got = np.asarray(jorb.fast_score(img[None]))[0]
    expected = oracle.fast_score(img)
    np.testing.assert_allclose(got, expected, atol=1e-3)


def test_fast_count_matches_oracle_small_border():
    img = corner_image()
    got = float(
        np.asarray(
            jnp_sum_keypoints(img, edge_threshold=8)
        )
    )
    expected = oracle.fast_keypoint_count(img, edge_threshold=8)
    assert got == expected
    assert expected > 0  # sanity: the pattern does produce corners


def jnp_sum_keypoints(img, edge_threshold):
    kmap = jorb.fast_keypoint_map(img[None], edge_threshold=edge_threshold)
    return (np.asarray(kmap)[0] > 0).sum()


def test_orb_border_kills_64x64():
    # edgeThreshold=31 on 64x64 leaves a 2x2 valid zone: counts ~0 unless a
    # corner lands exactly there (reference README's ~0.08 mean count).
    img = corner_image()
    cnt = float(np.asarray(jorb.orb_keypoint_count(img[None]))[0])
    assert cnt <= 4.0


def test_orb_center_corner_survives_border():
    # A tie-free corner at (31,31) — inside the 2x2 valid zone that
    # edgeThreshold=31 leaves on a 64x64 frame.
    yy, xx = np.mgrid[0:64, 0:64]
    img = (yy * 0.31 + xx * 0.17).astype(np.float32)
    img[31:38, 31:38] = 230.0
    cnt = float(np.asarray(jorb.orb_keypoint_count(img[None]))[0])
    assert cnt >= 1.0


def test_orb_count_flat_is_zero():
    img = np.full((64, 64), 50.0, np.float32)
    assert float(np.asarray(jorb.orb_keypoint_count(img[None]))[0]) == 0.0


def test_orb_count_capped():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (96, 96)).astype(np.float32)
    cnt = float(np.asarray(jorb.orb_keypoint_count(img[None], nfeatures=10, edge_threshold=4))[0])
    assert cnt <= 10.0


def test_orb_features_fixed_k():
    img = corner_image()
    feats = jorb.orb_features(img[None], k=32, edge_threshold=8)
    assert feats["ys"].shape == (1, 32)
    assert feats["desc"].shape == (1, 32, 256)
    valid = np.asarray(feats["valid"])[0]
    n_valid = int(valid.sum())
    assert n_valid == oracle.fast_keypoint_count(img, edge_threshold=8)
    # Descriptors of invalid slots are all-zero.
    desc = np.asarray(feats["desc"])[0]
    assert not desc[~valid].any()


def test_orb_features_harris_ranked_retention():
    """When the K cap binds, retention keeps the best corners by Harris
    response (cv2 ORB's default HARRIS_SCORE retainBest policy — VERDICT r1
    next-step 7), not by raw FAST score."""
    img = corner_image()
    full = jorb.orb_features(img[None], k=64, edge_threshold=8)
    n_corners = int(np.asarray(full["valid"])[0].sum())
    assert n_corners > 4  # the cap below really binds

    capped = jorb.orb_features(img[None], k=4, edge_threshold=8)
    assert bool(np.asarray(capped["valid"]).all())

    # The kept 4 are exactly the top-4 of the full set by Harris response.
    fs, fy, fx, fv = (np.asarray(full[n])[0] for n in ("score", "ys", "xs", "valid"))
    order = np.argsort(-fs[fv])
    top4 = {(int(y), int(x)) for y, x in zip(fy[fv][order[:4]], fx[fv][order[:4]])}
    kept = {
        (int(y), int(x))
        for y, x in zip(np.asarray(capped["ys"])[0], np.asarray(capped["xs"])[0])
    }
    assert kept == top4

    # Scores come back sorted descending and are genuine Harris responses.
    cs = np.asarray(capped["score"])[0]
    assert (np.diff(cs) <= 1e-9).all()
    dense = np.asarray(jorb.harris_response(img[None]))[0]
    for (y, x), s in zip(
        zip(np.asarray(capped["ys"])[0], np.asarray(capped["xs"])[0]), cs
    ):
        assert s == pytest.approx(float(dense[y, x]), rel=1e-5)


def test_orb_descriptor_rotation_stability():
    # A descriptor should be (mostly) stable under small rotations of the
    # patch content because BRIEF is steered by the orientation estimate.
    img = corner_image()
    feats = jorb.orb_features(img[None], k=8, edge_threshold=8)
    d = np.asarray(feats["desc"])[0]
    v = np.asarray(feats["valid"])[0]
    assert d[v].shape[1] == 256
