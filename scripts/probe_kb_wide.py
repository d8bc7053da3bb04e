"""Round-5 probe: motion kb at 1440p/4K complexity (half-res search bands).

The 1080p in-suite A/B (probes/KB23_AB_r05.json) confirmed 3-strips-per-
band (kb=23) beats the kb=16 ladder by ~3 ms. Same lever at the wider
resolutions before changing the production default:

- 1440p half-res: 720 rows / block 8 = 90 block-rows; wq=1280 budget caps
  kb at 32. kb=30 -> 3 strips, hb2=720 exactly (zero pad) vs kb=16 ->
  6 strips, hb2=768.
- 4K half-res: 1080 rows -> 135 block-rows; wq=1920 budget caps kb at 21.
  kb=21 -> 7 strips (1176) vs kb=16 -> 9 strips (1152): fewer cells, more
  pad — genuinely ambiguous, needs the measurement.

Interleaved A/B per resolution, batch sized to the bench's wide-phase
complexity batches. Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_kb_wide.py
"""

import json
import statistics
import time
import traceback

import numpy as np

import jax

from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

enable_persistent_cache()

T0 = time.perf_counter()
REPS = 6
RESULTS: dict = {}


def note(msg):
    print(f"[probe] {msg} (+{time.perf_counter() - T0:.1f}s)", flush=True)


def main():
    import jax.numpy as jnp

    from bench import device_frame_fns
    from rtvqa_tpu.metrics.complexity import complexity_suite_packed

    note(f"backend={jax.default_backend()}")
    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    for label, h, w, nc, kbs in (
        ("1440p", 1440, 2560, 72, (None, 30)),
        ("4k", 2160, 3840, 32, (None, 21)),
    ):
        try:
            gen_ref, _ = device_frame_fns(nc, h, w)
            ry, ru, rv = gen_ref(0)
            np.asarray(ry[0, 0, :8])
            note(f"{label} inputs staged (batch {nc})")
            n = np.int32(nc)
            ts = [
                jax.device_put((np.arange(nc) * 33.3 + rep).astype(np.float32))
                for rep in range(2 * REPS + 2)
            ]

            def disp(t, kb):
                return complexity_suite_packed(
                    ry, ru, rv, t, n, resize_h=64, resize_w=64,
                    motion_impl="pallas", motion_kb=kb,
                )

            for i, kb in enumerate(kbs):
                np.asarray(disp(ts[-1 - i], kb))
            note(f"{label} warm")
            times = {kb: [] for kb in kbs}
            k = 0
            for rep in range(REPS):
                for kb in kbs:
                    t0 = time.perf_counter()
                    np.asarray(disp(ts[k], kb))
                    times[kb].append(time.perf_counter() - t0)
                    k += 1
            for kb in kbs:
                med = statistics.median(times[kb])
                RESULTS[f"{label}/kb{kb or 16}"] = {
                    "median_s": round(med, 5),
                    "all": [round(t, 4) for t in times[kb]],
                    "batch": nc,
                }
                note(f"{label}/kb{kb or 16}: {med * 1000:.1f} ms")
        except Exception as e:
            RESULTS[f"{label}/error"] = f"{type(e).__name__}: {e}"
            note(f"{label} FAILED: {e}")
            traceback.print_exc()

    with open("probes/KB_WIDE_r05.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    note("wrote probes/KB_WIDE_r05.json")


if __name__ == "__main__":
    main()
