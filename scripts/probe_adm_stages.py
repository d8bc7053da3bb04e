"""Stage-level cost attribution for the fused ADM scale-0 kernel.

The DMA-floor probe (probe_dma_floor.py) showed raw HBM reads of the full
128x1080p input cost <5 ms beyond the ~25 ms per-call floor, so the ~80 ms
ADM kernel is compute/Mosaic-bound.  This bisects WHERE: it times the
scale-0 kernel truncated after each stage (same DMAs, same output writes —
successive deltas isolate one stage's compute):

  1 DMA only | 2 +row matmuls | 3 +column matmuls | 4 +decouple
  5 +masking spread | 6 full (pooling)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_adm_stages.py
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
        print(f"[stg] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench

    gen, distort = bench.device_frame_fns(N, H, W)
    ry = gen(0)[0]
    # Distinct uint8 variants (round 4): `dy + tag` would promote the pair
    # to f32 and probe the wrong dataflow — the production path feeds RAW
    # uint8 (int8-bitcast DMA + in-VMEM rebuild, round 3i).
    dys = [distort(ry, 10 + k) for k in range(32)]
    jax.block_until_ready(dys)
    np.asarray(dys[0][0, 0, :8])
    note("inputs on-device")

    from rtvqa_tpu.kernels.adm_pallas import adm_scale_pallas

    HALO_IN = 4  # the round-3a..3d kernels' input halo (prep now removed)

    _seq = iter(range(10**6))

    def make_run(stages):
        def run(tag):
            num0, den0, _, _ = adm_scale_pallas(
                ry, dys[next(_seq) % len(dys)], 0, stages=stages)
            return np.asarray(num0 + den0)
        return run

    # In-session per-call floor: fetch an 8-float slice of a resident array.
    # Arrays are ARGUMENTS, never closures (HTTP 413, CLAUDE.md).
    @jax.jit
    def tiny(a, tag):
        return a[0, 0, :8] + tag

    # prep-only: the astype+pad input staging the pallas_call forces to
    # materialize (optimization_barrier stops XLA fusing pad into the sum).
    @jax.jit
    def prep_only(a, b_, tag):
        def prep(x):
            x = jnp.pad(x + tag, ((0, 0), (0, 0), (HALO_IN, HALO_IN)),
                        mode="reflect")
            x = jnp.pad(x, ((0, 0), (HALO_IN, HALO_IN), (0, 0)),
                        mode="reflect")
            x = jnp.pad(x, ((0, 0), (0, 28), (0, 2176 - x.shape[-1])),
                        mode="edge")
            return jax.lax.optimization_barrier(x)
        return prep(a)[:, 0, :8].sum() + prep(b_)[:, 0, :8].sum()

    runs = {"floor": lambda tag: np.asarray(tiny(ry, tag)),
            "prep": lambda tag: np.asarray(prep_only(ry, dys[0], tag))}
    runs.update({st: make_run(st) for st in (0, 1, 2, 3, 4, 5, 6)})
    tags = [jnp.float32(k * 1e-6) for k in range(len(runs) * (REPS + 2))]
    for idx, (st, fn) in enumerate(runs.items()):
        fn(tags[len(runs) * REPS + idx])
        note(f"warm {st}")
    times = {st: [] for st in runs}
    for r in range(REPS):
        for idx, (st, fn) in enumerate(runs.items()):
            t1 = time.perf_counter()
            fn(tags[len(runs) * r + idx])
            times[st].append(time.perf_counter() - t1)
    meds = {}
    for st, vals in times.items():
        meds[st] = sorted(vals)[len(vals) // 2] * 1000
        ms = ", ".join(f"{v * 1000:.1f}" for v in vals)
        print(f"[stg] stage[{st}]: {ms} ms (median {meds[st]:.1f})",
              flush=True)
    names = {0: "dma+sums(no big outs)", 1: "+big output writes",
             2: "+row_matmul", 3: "+col_matmul", 4: "+decouple",
             5: "+masking", 6: "+pooling"}
    prev = 0.0
    for st in (0, 1, 2, 3, 4, 5, 6):
        print(f"[stg] delta[{names[st]}]: {meds[st] - prev:+.1f} ms",
              flush=True)
        prev = meds[st]
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
