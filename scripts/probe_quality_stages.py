"""Stage-level cost attribution for the fused quality kernel (VIF0 + PSNR +
SSIM + motion). Same methodology as probe_adm_stages.py: time the kernel
truncated after each stage (same DMAs, same output writes), successive
deltas isolate one stage's compute.

  1 DMA | 2 +progA luma (SSE/blur/SAD) | 3 +SSIM luma | 4 +chroma
  5 +VIF0 stats | 6 full (+dec)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_quality_stages.py
"""

from __future__ import annotations

import time

import numpy as np

N, H, W = 128, 1080, 1920
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    t0 = time.perf_counter()

    def note(msg):
        print(f"[qstg] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench

    gen, distort = bench.device_frame_fns(N, H, W)
    ry, ru, rv = gen(0)
    dy = distort(ry, 1)
    du = distort(ru, 2)
    dv = distort(rv, 3)
    pb = jax.jit(lambda: jnp.zeros((H, W), jnp.float32))()
    np.asarray(dy[0, 0, :8])
    note("inputs on-device")

    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas

    # De-memoize with distinct uint8 dis variants (round 3i: the kernel's
    # raw-int8 path requires the PRODUCTION dtype; `dy + tag` would promote
    # the pair to f32 and probe the wrong dataflow).
    dys = [distort(ry, 10 + k) for k in range(REPS + 2)]
    jax.block_until_ready(dys)

    def make_run(stages):
        def run(k):
            out = quality_fused_pallas(
                ry, ru, rv, dys[k % len(dys)], du, dv, pb, stages=stages
            )
            return np.asarray(out["vif_scale0"] + out["sse_y"]
                              + out["sad_sum"])
        return run

    @jax.jit
    def tiny(a, tag):
        return a[0, 0, :8].astype(jnp.float32) + tag

    tagv = [jnp.float32(k * 1e-6) for k in range(64)]
    runs = {"floor": lambda k: np.asarray(tiny(ry, tagv[k % len(tagv)]))}
    runs.update({st: make_run(st) for st in (1, 2, 3, 4, 5, 6)})
    for idx, (st, fn) in enumerate(runs.items()):
        fn(REPS + 1)
        note(f"warm {st}")
    times = {st: [] for st in runs}
    for r in range(REPS):
        for idx, (st, fn) in enumerate(runs.items()):
            t1 = time.perf_counter()
            fn(r)
            times[st].append(time.perf_counter() - t1)
    meds = {}
    for st, vals in times.items():
        meds[st] = sorted(vals)[len(vals) // 2] * 1000
        ms = ", ".join(f"{v * 1000:.1f}" for v in vals)
        print(f"[qstg] stage[{st}]: {ms} ms (median {meds[st]:.1f})",
              flush=True)
    names = {1: "dma+outputs", 2: "+progA luma", 3: "+ssim luma",
             4: "+chroma", 5: "+vif0 stats", 6: "+dec"}
    prev = 0.0
    for st in (1, 2, 3, 4, 5, 6):
        print(f"[qstg] delta[{names[st]}]: {meds[st] - prev:+.1f} ms",
              flush=True)
        prev = meds[st]
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
