"""In-session A/B: full fused complexity suite with reduce_window down2 (new)
vs the reshape-reduce form (round 3a) — session-to-session throughput varies
~25% (CLAUDE.md), so only interleaved same-process numbers count.

Monkeypatches ops.motion.down2_mean and clears jit caches between variants so
each trace picks up the patched global; outputs are cross-checked bitwise.
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
        print(f"[ab] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench

    gen, _ = bench.device_frame_fns(N, H, W)
    y, u, v = gen(0)
    np.asarray(y[0, 0, :8])
    note("inputs synthesized on-device")

    from rtvqa_tpu.metrics import complexity as cx
    from rtvqa_tpu.ops import motion as m

    n = np.int32(N)
    # 2*REPS distinct timestamp vectors per variant (memoization defeat),
    # plus one warmup vector per variant.
    ts = [
        jax.device_put((np.arange(N) * 33.3 + k).astype(np.float32))
        for k in range(2 * REPS + 2)
    ]

    def run(t):
        return np.asarray(cx.complexity_suite_packed(
            y, u, v, t, n, resize_h=64, resize_w=64, motion_impl="pallas"
        ))

    impls = {"reduce_window": m.down2_mean, "reshape_reduce": m._down2_mean_reshape}
    outs = {}
    times = {k: [] for k in impls}
    try:
        # Warm both traces first (compile outside timed region).
        for i, (name, fn) in enumerate(impls.items()):
            m.down2_mean = fn
            jax.clear_caches()
            outs[name] = run(ts[2 * REPS + i])
            note(f"warm {name}")
        # Interleaved timed reps.
        for r in range(REPS):
            for i, (name, fn) in enumerate(impls.items()):
                m.down2_mean = fn
                jax.clear_caches()
                # Re-warm after cache clear (compile cache is persistent on
                # disk, so this is a cheap reload, not a recompile).
                run(ts[2 * REPS + i])
                t1 = time.perf_counter()
                run(ts[2 * r + i])
                times[name].append(time.perf_counter() - t1)
        for name, vals in times.items():
            ms = ", ".join(f"{v * 1000:.1f}" for v in vals)
            print(f"[ab] suite[{name}]: {ms} ms "
                  f"(median {sorted(vals)[len(vals)//2]*1000:.1f})", flush=True)
        d = np.max(np.abs(outs["reduce_window"] - outs["reshape_reduce"]))
        print(f"[ab] output max_abs_diff: {d:.3g}", flush=True)
    except Exception:
        traceback.print_exc()
        return 1
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
