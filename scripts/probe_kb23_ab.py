"""Round-5 confirmation A/B: motion kb=16 (default) vs kb=23 in-suite.

probes/COMPLEXITY_STRIPS_r05.json showed kb23 at 48.7 ms vs 51.5/51.8 for
the default — a ~5% phase win near the noise floor. This interleaves the
two programs rep-by-rep in one session (both warmed first) so session
drift cancels, 10 reps each, medians reported.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_kb23_ab.py
"""

import json
import statistics
import time

import numpy as np

import jax

from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

enable_persistent_cache()

T0 = time.perf_counter()
REPS = 10
N, H, W = 128, 1080, 1920


def note(msg):
    print(f"[probe] {msg} (+{time.perf_counter() - T0:.1f}s)", flush=True)


def main():
    import jax.numpy as jnp

    from bench import device_frame_fns
    from rtvqa_tpu.metrics.complexity import complexity_suite_packed

    note(f"backend={jax.default_backend()}")
    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    gen_ref, _ = device_frame_fns(N, H, W)
    ry, ru, rv = gen_ref(0)
    np.asarray(ry[0, 0, :8])
    note("inputs staged")

    n = np.int32(N)
    ts = [
        jax.device_put((np.arange(N) * 33.3 + rep).astype(np.float32))
        for rep in range(2 * REPS + 2)
    ]

    def disp(t, kb):
        return complexity_suite_packed(
            ry, ru, rv, t, n, resize_h=64, resize_w=64,
            motion_impl="pallas", motion_kb=kb,
        )

    np.asarray(disp(ts[-1], None))
    np.asarray(disp(ts[-2], 23))
    note("both warm")

    times = {None: [], 23: []}
    k = 0
    for rep in range(REPS):
        for kb in (None, 23):
            t0 = time.perf_counter()
            np.asarray(disp(ts[k], kb))
            times[kb].append(time.perf_counter() - t0)
            k += 1
    out = {
        "kb16_median_s": round(statistics.median(times[None]), 5),
        "kb23_median_s": round(statistics.median(times[23]), 5),
        "kb16_all": [round(t, 4) for t in times[None]],
        "kb23_all": [round(t, 4) for t in times[23]],
    }
    note(f"kb16 {out['kb16_median_s'] * 1000:.1f} ms  "
         f"kb23 {out['kb23_median_s'] * 1000:.1f} ms")
    with open("probes/KB23_AB_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    note("wrote probes/KB23_AB_r05.json")


if __name__ == "__main__":
    main()
