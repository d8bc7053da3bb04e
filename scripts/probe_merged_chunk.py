"""Probe: the merged quality+complexity chunk program on the real TPU.

Questions (one session, all try/except isolated):
1. does ``_program_chunk_combined`` COMPILE at 128 x 1080p frames (both
   constituent programs individually compile at 128; 256 is RESOURCE_EXHAUSTED
   for each — the merged peak is the open question)?
2. merged time vs the current headline accounting (complexity_suite_packed +
   _program_chunk measured separately, 2 dispatch+fetch round trips)?
3. fallback: merged at 64 frames (the production auto_chunk at 1080p).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_merged_chunk.py
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
        print(f"[merged] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench

    gen, distort = bench.device_frame_fns(N, H, W)
    ry, ru, rv = gen(0)
    dy = distort(ry, 1)
    np.asarray(dy[0, 0, :8])
    note("inputs synthesized on-device")

    from rtvqa_tpu.metrics.complexity import complexity_suite_packed
    from rtvqa_tpu.metrics.full_reference import (
        _program_chunk, _program_chunk_combined,
    )

    fill = jax.jit(lambda c: jnp.full((H, W), c, jnp.float32))
    blurs = [fill(np.float32(1e-3 * (k + 1))) for k in range(REPS + 1)]
    zt = (
        jax.device_put(np.zeros((H, W), np.uint8)),
        jax.device_put(np.zeros((H // 2, W // 2), np.uint8)),
        jax.device_put(np.zeros((H // 2, W // 2), np.uint8)),
    )
    ts = [
        jax.device_put((np.arange(N) * 33.3 + k).astype(np.float32))
        for k in range(REPS + 1)
    ]
    n = np.int32(N)

    def timeit(name, fn, variants):
        try:
            fn(variants[-1])  # warmup/compile
            t1 = time.perf_counter()
            for k in range(REPS):
                fn(variants[k])
            dt = (time.perf_counter() - t1) / REPS
            print(f"[merged] {name}: {dt * 1000:.1f} ms", flush=True)
            return dt
        except Exception:
            print(f"[merged] {name}: FAILED", flush=True)
            traceback.print_exc()
            return None

    def run_merged(nf):
        def run(blur):
            packed, _, _, _, _ = _program_chunk_combined(
                ry[:nf], ru[:nf], rv[:nf], dy[:nf], ru[:nf], rv[:nf],
                blur, True, *zt,
                resize_h=64, resize_w=64, motion_search="pyramid",
                motion_impl="pallas", complexity_on="dis",
            )
            np.asarray(packed)
        return run

    dt_m = timeit("merged@128", run_merged(N), blurs)

    def run_q(blur):
        packed, _ = _program_chunk(ry, ru, rv, dy, ru, rv, blur, True)
        np.asarray(packed)

    dt_q = timeit("quality@128", run_q, blurs)

    def run_c(t):
        np.asarray(complexity_suite_packed(
            ry, ru, rv, t, n, resize_h=64, resize_w=64, motion_impl="pallas"
        ))

    dt_c = timeit("complexity_suite@128", run_c, ts)

    if dt_m is None:
        timeit("merged@64", run_merged(64), blurs)

    if dt_m and dt_q and dt_c:
        print(
            f"[merged] headline: merged {N / dt_m:.1f} f/s vs separate "
            f"{N / (dt_q + dt_c):.1f} f/s", flush=True,
        )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
