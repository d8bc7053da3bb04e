"""Probe: the planar color path (round 3c) on the real TPU.

Prior session (round-3c A/B session, scripts/probe_adm_ab.py): interleaved
(..., H, W, 3) forms measured yuv420_to_gray 75.4 ms / rgb+resize+color_entropy
68.0 ms standalone at 128x1080p. This probe times the rewritten planar forms
plus the full fused suite, with a same-session trivial-program floor anchor so
cross-session comparison is honest (session throughput varies ~25%).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_color_path.py
"""

from __future__ import annotations

import time
import traceback

import numpy as np

H, W = 1080, 1920
N = 128
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    t0 = time.perf_counter()

    def note(msg):
        print(f"[color] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench

    gen, _ = bench.device_frame_fns(N, H, W)
    y, u, v = gen(0)
    np.asarray(y[0, 0, :8])
    note("inputs synthesized on-device")

    tags = [jnp.float32(k * 1e-6) for k in range(REPS + 1)]

    def timeit(name, fn, variants=tags):
        try:
            fn(variants[-1])
            t1 = time.perf_counter()
            for k in range(REPS):
                fn(variants[k])
            dt = (time.perf_counter() - t1) / REPS
            print(f"[color] {name}: {dt * 1000:.1f} ms", flush=True)
            return dt
        except Exception:
            print(f"[color] {name}: FAILED", flush=True)
            traceback.print_exc()
            return None

    # Same-session per-call floor anchor: trivial program + tiny fetch.
    @jax.jit
    def trivial(tag):
        return jnp.zeros(8, jnp.float32) + tag

    timeit("call_floor(trivial)", lambda k: np.asarray(trivial(k)))

    from rtvqa_tpu.metrics.complexity import complexity_suite_packed
    from rtvqa_tpu.ops.color import yuv420_to_gray, yuv420_to_rgb_planes
    from rtvqa_tpu.ops.histogram import color_entropy
    from rtvqa_tpu.ops.resize import resize_bilinear

    @jax.jit
    def conv_gray(yy, uu, vv, tag):
        return jnp.sum(yuv420_to_gray(yy, uu, vv) + tag)

    timeit("yuv420_to_gray(planar)",
           lambda k: np.asarray(conv_gray(y, u, v, k)))

    @jax.jit
    def color_path(yy, uu, vv, tag):
        r, g, b = yuv420_to_rgb_planes(yy, uu, vv)
        rs = resize_bilinear(jnp.stack([r, g, b], axis=1) + tag, 64, 64)
        return jnp.sum(color_entropy(jnp.moveaxis(rs, 1, -1)))

    timeit("rgb+resize+color_entropy(planar)",
           lambda k: np.asarray(color_path(y, u, v, k)))

    n = np.int32(N)
    ts = [
        jax.device_put((np.arange(N) * 33.3 + k).astype(np.float32))
        for k in range(REPS + 1)
    ]

    def run_suite(t):
        np.asarray(complexity_suite_packed(
            y, u, v, t, n, resize_h=64, resize_w=64, motion_impl="pallas"
        ))

    timeit("suite pyramid@128", run_suite, ts)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
