"""Round-5 probe: complexity-suite grid-cell sweep (motion kb x gray strip).

The quality-kernel strip sweep (probes/STRIP_AB_r05.json) showed halved
grid-cell counts keep paying once the scoped-VMEM budget is raised. This
applies the same lever to the complexity phase's two Pallas kernels:

- half-res pyramid search (`motion_pallas`): kb block-rows per cell; at
  1080p half-res (540 rows / block 8 = 67 block-rows) the default kb=16
  gives 5 strips/band (hb2=640, 18% pad rows). kb=23 -> 3 strips (552,
  2% pad), kb=34 -> 2 strips (544, 1% pad).
- gray kernel (`gray_pallas`): strip=64 default -> 17 cells at 1080p;
  strip=128 -> 9 cells.

Measures complexity_suite_packed at the headline 128x1080p batch, depth-1
fetch pipelining like bench.py, all configs in ONE session (A/B
interleaved is overkill here; per-config medians in one session are the
bench's own methodology). Expectation management: per-cell Mosaic overhead
is ~2.7 us; search is 9-10 cells/frame-pair and gray 17 cells/frame today,
so the whole-idea ceiling is a few ms — the probe decides if it's real.

Run (background; first fetch can stall minutes):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_complexity_strips.py
"""

import json
import time
import traceback

import numpy as np

import jax

from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

enable_persistent_cache()

T0 = time.perf_counter()
RESULTS: dict = {}
REPS = 5
N, H, W = 128, 1080, 1920


def note(msg):
    print(f"[probe] {msg} (+{time.perf_counter() - T0:.1f}s)", flush=True)


def main():
    import jax.numpy as jnp

    from bench import device_frame_fns
    from rtvqa_tpu.metrics.complexity import complexity_suite_packed

    note(f"backend={jax.default_backend()} devices={jax.devices()}")
    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    gen_ref, _ = device_frame_fns(N, H, W)
    ry, ru, rv = gen_ref(0)
    np.asarray(ry[0, 0, :8])
    note("inputs staged")

    n = np.int32(N)
    ts = [
        jax.device_put((np.arange(N) * 33.3 + rep).astype(np.float32))
        for rep in range(REPS + 1)
    ]

    configs = [
        ("kb16/g64", None, None),   # production defaults
        ("kb23/g64", 23, None),
        ("kb34/g64", 34, None),
        ("kb16/g128", None, 128),
        ("kb34/g128", 34, 128),
    ]
    base = None
    for name, kb, gs in configs:
        try:
            def disp(t, kb=kb, gs=gs):
                return complexity_suite_packed(
                    ry, ru, rv, t, n, resize_h=64, resize_w=64,
                    motion_impl="pallas", motion_kb=kb, gray_strip=gs,
                )

            warm = np.asarray(disp(ts[-1]))
            if base is None:
                base = warm
            err = float(np.max(np.abs(warm - base) / (np.abs(base) + 1e-9)))
            note(f"{name} compiled; rel-vs-base {err:.2e}")
            t0 = time.perf_counter()
            prev = None
            for rep in range(REPS):
                out = disp(ts[rep])
                if prev is not None:
                    np.asarray(prev)
                prev = out
            np.asarray(prev)
            dt = (time.perf_counter() - t0) / REPS
            RESULTS[name] = {"s_per_rep": round(dt, 5), "rel_err": err}
            note(f"{name}: {dt * 1000:.1f} ms/rep")
        except Exception as e:
            RESULTS[name] = {"error": f"{type(e).__name__}: {e}"}
            note(f"{name} FAILED: {e}")
            traceback.print_exc()

    # Re-run the default config LAST to bound intra-session drift.
    try:
        def disp0(t):
            return complexity_suite_packed(
                ry, ru, rv, t, n, resize_h=64, resize_w=64,
                motion_impl="pallas",
            )

        np.asarray(disp0(ts[-1]))
        t0 = time.perf_counter()
        prev = None
        for rep in range(REPS):
            out = disp0(ts[rep])
            if prev is not None:
                np.asarray(prev)
            prev = out
        np.asarray(prev)
        dt = (time.perf_counter() - t0) / REPS
        RESULTS["kb16/g64/recheck"] = {"s_per_rep": round(dt, 5)}
        note(f"recheck: {dt * 1000:.1f} ms/rep")
    except Exception as e:
        RESULTS["kb16/g64/recheck"] = {"error": str(e)}

    with open("probes/COMPLEXITY_STRIPS_r05.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    note("wrote probes/COMPLEXITY_STRIPS_r05.json")


if __name__ == "__main__":
    main()
