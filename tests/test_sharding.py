"""Multi-device sharding tests on the virtual 8-device CPU mesh (conftest)."""

import jax
import numpy as np
import pytest

from rtvqa_tpu.metrics.complexity import complexity_suite
from rtvqa_tpu.parallel.sharding import make_mesh, sharded_complexity_suite


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def make_inputs(c=2, n=16, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (c, n, h, w), np.uint8)
    u = rng.integers(0, 256, (c, n, h // 2, w // 2), np.uint8)
    v = rng.integers(0, 256, (c, n, h // 2, w // 2), np.uint8)
    ts = (np.arange(n, dtype=np.float32) * 100.0)[None, :].repeat(c, 0)
    n_valid = np.array([n, n - 3], np.int32)
    return y, u, v, ts, n_valid


def test_sharded_matches_single_device(devices):
    mesh = make_mesh(n_clip=2, n_frame=4)
    y, u, v, ts, n_valid = make_inputs()
    fn = sharded_complexity_suite(mesh, resize_h=24, resize_w=24, block=8, radius=4)
    out = fn(y, u, v, ts, n_valid)

    for clip in range(2):
        ref = complexity_suite(
            y[clip], u[clip], v[clip], ts[clip], n_valid[clip],
            resize_h=24, resize_w=24, block=8, radius=4,
        )
        for key, val in out.items():
            got = float(np.asarray(val)[clip])
            exp = float(np.asarray(ref[key]))
            assert got == pytest.approx(exp, rel=2e-4, abs=2e-4), (key, clip)


def test_sharded_8way_frame_axis(devices):
    mesh = make_mesh(n_clip=1, n_frame=8)
    y, u, v, ts, n_valid = make_inputs(c=1, n=24)
    fn = sharded_complexity_suite(mesh, resize_h=16, resize_w=16, block=8, radius=4)
    out = fn(y, u, v, ts, n_valid[:1])
    ref = complexity_suite(
        y[0], u[0], v[0], ts[0], n_valid[0],
        resize_h=16, resize_w=16, block=8, radius=4,
    )
    for key, val in out.items():
        assert float(np.asarray(val)[0]) == pytest.approx(
            float(np.asarray(ref[key])), rel=2e-4, abs=2e-4
        ), key


def test_determinism_same_input_same_output(devices):
    # SURVEY.md §4 determinism: same clip twice -> identical metrics.
    mesh = make_mesh(n_clip=1, n_frame=8)
    y, u, v, ts, n_valid = make_inputs(c=1)
    fn = sharded_complexity_suite(mesh, resize_h=16, resize_w=16, block=8, radius=4)
    a = fn(y, u, v, ts, n_valid[:1])
    b = fn(y, u, v, ts, n_valid[:1])
    for key in a:
        assert np.asarray(a[key]).tobytes() == np.asarray(b[key]).tobytes()
