"""On-device probe: can depth-1 dispatch-ahead hide the per-rep fetch RPC
(~30-40 ms) that bench.py's phase loops currently serialize?

Production streaming pipelines decode/upload against device compute
(io.stream.prefetch); the headline phases should likewise not charge the
tunnel's small-fetch RPC to the device when the NEXT chunk's program can
be in flight during it. Risk probed: CLAUDE.md notes concurrent dispatch
of two big programs can crash the worker — depth-1 keeps at most two in
flight; a crash here fails loudly in this probe process only.

Modes per program (quality chunk, complexity suite), interleaved:
  serial  — dispatch; fetch (the current bench loop)
  pipe    — dispatch rep k; fetch rep k-1 (steady state: fetch overlaps
            the in-flight execution)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_pipeline_fetch.py
"""

from __future__ import annotations

import time

import numpy as np

N, H, W = 128, 1080, 1920
REPS = 4


def main():
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    t0 = time.perf_counter()

    def note(msg):
        print(f"[pipe] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench
    from rtvqa_tpu.metrics.complexity import complexity_suite_packed
    from rtvqa_tpu.metrics.full_reference import _program_chunk

    gen, distort = bench.device_frame_fns(N, H, W)
    ry, ru, rv = gen(0)
    dy = distort(ry, 1)
    np.asarray(dy[0, 0, :8])

    fill = jax.jit(lambda c: jnp.full((H, W), c, jnp.float32))
    n_blurs = 4 * (REPS + 1)
    blurs = [fill(np.float32(1e-3 * (k + 1))) for k in range(n_blurs)]
    ts = [
        jax.device_put((np.arange(N) * 33.3 + k).astype(np.float32))
        for k in range(n_blurs)
    ]
    jax.block_until_ready(blurs)
    note("inputs on-device")

    _q_seq = iter(range(10**6))
    _c_seq = iter(range(10**6))

    def disp_q():
        packed, _ = _program_chunk(
            ry, ru, rv, dy, ru, rv, blurs[next(_q_seq) % n_blurs], True)
        return packed

    def disp_c():
        return complexity_suite_packed(
            ry, ru, rv, ts[next(_c_seq) % n_blurs], np.int32(N),
            resize_h=64, resize_w=64, motion_impl="pallas")

    np.asarray(disp_q())
    note("quality warm")
    np.asarray(disp_c())
    note("complexity warm")

    def serial(disp, k):
        t1 = time.perf_counter()
        for _ in range(k):
            np.asarray(disp())
        return (time.perf_counter() - t1) / k

    def pipe(disp, k):
        t1 = time.perf_counter()
        prev = None
        for _ in range(k):
            out = disp()
            if prev is not None:
                np.asarray(prev)
            prev = out
        np.asarray(prev)
        return (time.perf_counter() - t1) / k

    for label, disp in (("quality", disp_q), ("complexity", disp_c)):
        for mode, fn in (("serial", serial), ("pipe", pipe)):
            vals = [fn(disp, REPS) for _ in range(2)]
            ms = ", ".join(f"{v * 1000:.1f}" for v in vals)
            print(f"[pipe] {label}/{mode}: {ms} ms/rep", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
