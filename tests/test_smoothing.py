import numpy as np
import pandas as pd
import pytest

from rtvqa_tpu.ops.scan import ewm_mean, ewm_mean_masked, masked_mean


@pytest.mark.parametrize("alpha", [0.8, 0.3, 1.0])
@pytest.mark.parametrize("n", [1, 2, 7, 100])
def test_ewm_matches_pandas(rng, alpha, n):
    x = rng.normal(size=n).astype(np.float32) * 100
    expected = pd.Series(x).ewm(alpha=alpha).mean().to_numpy()
    got = np.asarray(ewm_mean(x, alpha))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_ewm_batched_axis(rng):
    x = rng.normal(size=(5, 40)).astype(np.float32)
    got = np.asarray(ewm_mean(x, 0.8, axis=1))
    for i in range(5):
        expected = pd.Series(x[i]).ewm(alpha=0.8).mean().to_numpy()
        np.testing.assert_allclose(got[i], expected, rtol=1e-5, atol=1e-5)


def test_ewm_masked_equals_unpadded(rng):
    # Padded-to-static-shape EWM must equal EWM on the valid prefix.
    x = rng.normal(size=32).astype(np.float32)
    n_valid = 13
    valid = np.arange(32) < n_valid
    sm, _ = ewm_mean_masked(x, 0.8, valid)
    expected = pd.Series(x[:n_valid]).ewm(alpha=0.8).mean().to_numpy()
    np.testing.assert_allclose(np.asarray(sm)[:n_valid], expected, rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(sm)[n_valid:] == 0)


def test_ewm_masked_interior_gaps(rng):
    # Gaps in the middle are skipped as if the elements were absent.
    x = rng.normal(size=10).astype(np.float32)
    valid = np.array([1, 1, 0, 1, 0, 0, 1, 1, 0, 1], dtype=bool)
    sm, _ = ewm_mean_masked(x, 0.8, valid)
    expected = pd.Series(x[valid]).ewm(alpha=0.8).mean().to_numpy()
    np.testing.assert_allclose(np.asarray(sm)[valid], expected, rtol=1e-5, atol=1e-5)


def test_masked_mean_empty_is_zero():
    x = np.ones(8, np.float32)
    valid = np.zeros(8, bool)
    assert float(masked_mean(x, valid)) == 0.0
