"""Round-5 probe (VERDICT r4 next #1 "done" criterion): on-device timing of
the sharded quality chunk step on a 1-DEVICE mesh vs the unsharded fused
chunk program, at the production shape (128 x 1080p).

The single real chip cannot exercise multi-chip scaling, but a 1-device
mesh runs the identical shard_map + Mosaic composition the multi-chip path
uses — so "per-chip perf parity under sharding" is measurable today: the
sharded step must land within ~10% of the unsharded 0.122 s chunk phase.
A/B in ONE session, interleaved (CLAUDE.md session-variance rule).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_sharded_timing.py
"""

from __future__ import annotations

import json
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
        print(f"[shard] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench
    from rtvqa_tpu.metrics.full_reference import _program_chunk
    from rtvqa_tpu.parallel.sharding import make_mesh, sharded_quality_chunk_step

    gen, distort = bench.device_frame_fns(N, H, W)
    y, u, v = gen(0)
    dy = distort(y, 1)
    du = distort(u, 2)
    dv = distort(v, 3)
    fill = jax.jit(lambda c: jnp.full((H, W), c, jnp.float32))
    blurs = [fill(np.float32(1e-3 * (rep + 1))) for rep in range(REPS + 1)]
    np.asarray(dy[0, 0, :8])
    note("inputs staged")

    mesh1 = make_mesh(n_clip=1, n_frame=1)
    step = sharded_quality_chunk_step(mesh1, impl="fused")

    def run_sharded(k):
        packed, blur = step(y, u, v, dy, du, dv, blurs[k], np.bool_(True))
        return np.asarray(packed)

    def run_unsharded(k):
        packed, blur = _program_chunk(y, u, v, dy, du, dv, blurs[k], True)
        return np.asarray(packed)

    results: dict = {}
    ps = run_sharded(REPS)
    note("sharded compiled + warm")
    pu = run_unsharded(REPS)
    note("unsharded compiled + warm")
    results["eq/max_abs_rel"] = float(
        np.max(np.abs(ps - pu) / np.maximum(np.abs(pu), 1e-6))
    )
    note(f"equality max rel: {results['eq/max_abs_rel']:.3g}")

    times = {"sharded": [], "unsharded": []}
    for r in range(REPS):
        for name, fn in (("sharded", run_sharded), ("unsharded", run_unsharded)):
            t1 = time.perf_counter()
            fn(r)
            times[name].append(time.perf_counter() - t1)
    for name, ts in times.items():
        results[name] = {
            "median_s": round(float(np.median(ts)), 4),
            "all_s": [round(x, 4) for x in ts],
        }
        note(f"{name}: {results[name]}")
    results["overhead_pct"] = round(
        100 * (results["sharded"]["median_s"] / results["unsharded"]["median_s"]
               - 1), 1)
    note(f"sharded overhead: {results['overhead_pct']}%")
    print("PROBE_JSON " + json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
