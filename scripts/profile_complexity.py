"""On-device breakdown of the complexity phase (dev tool, run on the TPU).

Measures, in ONE process (the tunnel charges a large, highly variable
per-process first-fetch sync — CLAUDE.md), with inputs synthesized on-device
and reps de-memoized by tiny distinct operands:

* the full fused complexity program (``complexity_suite_packed`` — the
  production dispatch) with pyramid and full motion search;
* motion standalone (Pallas pyramid / Pallas full / 2x2 downsample alone);
* every other metric component standalone, to locate the non-motion cost.

Each phase is isolated in try/except so one compile failure doesn't lose the
rest of the session (the first-fetch stall makes sessions expensive).

Usage: python scripts/profile_complexity.py [N_FRAMES]
"""

from __future__ import annotations

import sys
import time
import traceback

import numpy as np

H, W = 1080, 1920
N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
REPS = 2


def main():
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    t0 = time.perf_counter()

    def note(msg):
        print(f"[prof] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench

    gen, _distort = bench.device_frame_fns(N, H, W)
    y, u, v = gen(0)
    np.asarray(y[0, 0, :8])
    note("inputs synthesized on-device")

    results = {}

    def timeit(name, fn, variants):
        try:
            fn(variants[-1])
            t1 = time.perf_counter()
            for k in range(REPS):
                fn(variants[k])
            dt = (time.perf_counter() - t1) / REPS
            results[name] = dt
            print(f"[prof] {name}: {dt * 1000:.1f} ms", flush=True)
            return dt
        except Exception:
            print(f"[prof] {name}: FAILED", flush=True)
            traceback.print_exc()
            return None

    tags = [jnp.float32(k) for k in range(REPS + 1)]

    # --- production fused suite --------------------------------------------
    from rtvqa_tpu.metrics.complexity import complexity_suite_packed

    n = np.int32(N)
    ts = [
        jax.device_put((np.arange(N) * 33.3 + rep).astype(np.float32))
        for rep in range(REPS + 1)
    ]

    def run_suite(search):
        def run(t):
            np.asarray(complexity_suite_packed(
                y, u, v, t, n, resize_h=64, resize_w=64,
                motion_impl="pallas", motion_search=search,
            ))
        return run

    timeit("suite pyramid", run_suite("pyramid"), ts)
    timeit("suite full", run_suite("full"), ts)

    # --- motion standalone ---------------------------------------------------
    from rtvqa_tpu.kernels.motion_pallas import block_match_motion_pallas
    from rtvqa_tpu.ops.color import yuv420_to_gray, yuv420_to_rgb
    from rtvqa_tpu.ops.motion import block_match_motion_pyramid, down2_mean

    gray = jax.jit(yuv420_to_gray)(y, u, v)
    jax.block_until_ready(gray)

    @jax.jit
    def mot_pyr(g, tag):
        g = g + tag * 1e-30
        return jnp.sum(block_match_motion_pyramid(
            g[:-1], g[1:], block=16, radius=8, impl="pallas"
        ))

    timeit("motion pyramid pallas", lambda k: np.asarray(mot_pyr(gray, k)), tags)

    @jax.jit
    def mot_full(g, tag):
        g = g + tag * 1e-30
        return jnp.sum(block_match_motion_pallas(g[:-1], g[1:], block=16, radius=8))

    timeit("motion full pallas", lambda k: np.asarray(mot_full(gray, k)), tags)

    @jax.jit
    def just_down2(g, tag):
        return jnp.sum(down2_mean(g + tag * 1e-30))

    timeit("down2_mean", lambda k: np.asarray(just_down2(gray, k)), tags)

    # --- non-motion components ----------------------------------------------
    from rtvqa_tpu.ops.dct import dct_energy, temporal_dct_abs_diff
    from rtvqa_tpu.ops.edges import canny_edge_count
    from rtvqa_tpu.ops.histogram import color_entropy, gray_entropy
    from rtvqa_tpu.ops.orb import orb_keypoint_count
    from rtvqa_tpu.ops.resize import resize_bilinear

    @jax.jit
    def conv_gray(yy, uu, vv, tag):
        # Arrays passed as ARGUMENTS: jit closures over big device arrays
        # serialize into the remote-compile request body (HTTP 413, CLAUDE.md).
        return jnp.sum(yuv420_to_gray(yy, uu, vv) + tag * 1e-30)

    timeit("yuv420_to_gray", lambda k: np.asarray(conv_gray(y, u, v, k)), tags)

    from rtvqa_tpu.kernels.gray_pallas import yuv420_to_gray_pallas

    @jax.jit
    def conv_gray_pallas(yy, uu, vv, tag):
        return jnp.sum(yuv420_to_gray_pallas(yy, uu, vv) + tag * 1e-30)

    timeit(
        "gray_pallas (3h)",
        lambda k: np.asarray(conv_gray_pallas(y, u, v, k)), tags,
    )

    @jax.jit
    def rs64(g, tag):
        return jnp.sum(resize_bilinear(g + tag * 1e-30, 64, 64))

    timeit("resize 1080p->64", lambda k: np.asarray(rs64(gray, k)), tags)

    gray64 = jax.jit(lambda g: resize_bilinear(g, 64, 64))(gray)
    jax.block_until_ready(gray64)

    for name, fn in (
        ("dct_energy 64", lambda g: jnp.sum(dct_energy(g))),
        ("gray_entropy 64", lambda g: jnp.sum(gray_entropy(g))),
        ("canny 64", lambda g: jnp.sum(canny_edge_count(g, 100.0, 200.0))),
        ("orb 64", lambda g: jnp.sum(orb_keypoint_count(g))),
        ("temporal_dct 64", lambda g: jnp.sum(temporal_dct_abs_diff(g[:-1], g[1:]))),
    ):
        jf = jax.jit(lambda g, tag, f=fn: f(g + tag * 1e-30))
        timeit(name, lambda k, jf=jf: np.asarray(jf(gray64, k)), tags)

    @jax.jit
    def color_path(yy, uu, vv, tag):
        rgb = yuv420_to_rgb(yy, uu, vv) + tag * 1e-30
        rgb_rs = resize_bilinear(jnp.moveaxis(rgb, -1, 1), 64, 64)
        return jnp.sum(color_entropy(jnp.moveaxis(rgb_rs, 1, -1)))

    timeit(
        "rgb+resize+color_entropy",
        lambda k: np.asarray(color_path(y, u, v, k)), tags,
    )

    from rtvqa_tpu.ops.histogram import color_entropy_sampled

    @jax.jit
    def color_path_sampled(yy, uu, vv, tag):
        return jnp.sum(color_entropy_sampled(yy, uu, vv, 64, 64)) + tag * 1e-30

    timeit(
        "color_entropy_sampled (3g)",
        lambda k: np.asarray(color_path_sampled(y, u, v, k)), tags,
    )

    from rtvqa_tpu.ops.resize import resize_bilinear_sampled

    @jax.jit
    def rs64_sampled(g, tag):
        return jnp.sum(resize_bilinear_sampled(g + tag * 1e-30, 64, 64))

    timeit("resize sampled 1080p->64", lambda k: np.asarray(rs64_sampled(gray, k)), tags)

    known = sum(
        results.get(k, 0.0)
        for k in ("motion pyramid pallas", "yuv420_to_gray", "resize 1080p->64",
                  "dct_energy 64", "gray_entropy 64", "canny 64", "orb 64",
                  "temporal_dct 64", "rgb+resize+color_entropy")
    )
    if "suite pyramid" in results:
        print(
            f"[prof] suite {results['suite pyramid']*1000:.1f} ms vs sum of "
            f"measured components {known*1000:.1f} ms (gap = fusion wins + "
            f"unmeasured: ORB resize, EWM scans, dispatch)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
