import jax
import numpy as np
import pytest

from rtvqa_tpu.metrics.full_reference import A_KEYS, B_KEYS, _program_a, _program_b
from rtvqa_tpu.parallel.sharding import make_mesh, sharded_quality_step


def test_sharded_quality_matches_single_device(rng):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_clip=1, n_frame=8)
    n, h, w = 16, 32, 48
    ry = rng.integers(0, 256, (n, h, w), np.uint8)
    ru = rng.integers(0, 256, (n, h // 2, w // 2), np.uint8)
    rv = rng.integers(0, 256, (n, h // 2, w // 2), np.uint8)
    dy = np.clip(ry.astype(np.int16) + rng.integers(-9, 10, ry.shape), 0, 255).astype(np.uint8)

    fn = sharded_quality_step(mesh)
    packed = np.asarray(fn(ry, ru, rv, dy, ru, rv))
    assert packed.shape == (len(A_KEYS) + len(B_KEYS), n)

    pa, _ = _program_a(ry, ru, rv, dy, ru, rv, np.zeros((h, w), np.float32), True)
    pb = _program_b(ry, dy)
    expected = np.concatenate([np.asarray(pa), np.asarray(pb)], axis=0)
    np.testing.assert_allclose(packed, expected, rtol=2e-4, atol=2e-4)
