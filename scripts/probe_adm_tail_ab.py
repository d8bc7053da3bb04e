"""On-device A/B: ADM scales 1-3 as the round-4 per-frame tail kernel vs the
per-scale strip-kernel chain, standalone AND inside the production fused
chunk program, plus a headline-style quality-phase timing for both.

Methodology (CLAUDE.md): everything in ONE process, interleaved reps,
distinct inputs per rep (the tunnel memoizes identical executions), floor
measured in-session.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_adm_tail_ab.py
"""

from __future__ import annotations

import functools
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
        print(f"[admtail] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench

    gen, distort = bench.device_frame_fns(N, H, W)
    ry, ru, rv = gen(0)
    dys = [distort(ry, 10 + k) for k in range(REPS + 1)]
    du = distort(ru, 2)
    dv = distort(rv, 3)
    pb = jax.jit(lambda: jnp.zeros((H, W), jnp.float32))()
    jax.block_until_ready(dys)
    np.asarray(dys[0][0, 0, :8])
    note("inputs on-device")

    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas
    from rtvqa_tpu.metrics.full_reference import _chunk_fused_tpu

    chunk_tail = jax.jit(functools.partial(
        _chunk_fused_tpu, vif_egl=None, adm_egl=None, adm_tail=True))
    chunk_chain = jax.jit(functools.partial(
        _chunk_fused_tpu, vif_egl=None, adm_egl=None, adm_tail=False))

    @functools.partial(jax.jit, static_argnames=("tail",))
    def adm_only(dy, tail):
        return adm_features_pallas(ry, dy, tail=tail)["adm2"]

    @jax.jit
    def tiny(a, tag):
        return a[0, 0, :8].astype(jnp.float32) + tag

    tags = [jnp.float32(k * 1e-6) for k in range(64)]
    runs = {
        "floor": lambda k: np.asarray(tiny(ry, tags[k % 64])),
        "adm_tail": lambda k: np.asarray(
            adm_only(dys[k % len(dys)], True)),
        "adm_chain": lambda k: np.asarray(
            adm_only(dys[k % len(dys)], False)),
        "chunk_tail": lambda k: np.asarray(
            chunk_tail(ry, ru, rv, dys[k % len(dys)], du, dv, pb, True)[0]),
        "chunk_chain": lambda k: np.asarray(
            chunk_chain(ry, ru, rv, dys[k % len(dys)], du, dv, pb, True)[0]),
    }
    dead = set()
    for name, fn in runs.items():
        try:
            fn(REPS)
            note(f"warm {name}")
        except Exception as e:  # compile/VMEM failures: isolate, keep going
            dead.add(name)
            note(f"FAILED {name}: {type(e).__name__}: {str(e)[:400]}")
    times = {name: [] for name in runs if name not in dead}
    for r in range(REPS):
        for name in times:
            t1 = time.perf_counter()
            runs[name](r)
            times[name].append(time.perf_counter() - t1)
    for name, vals in times.items():
        med = sorted(vals)[len(vals) // 2] * 1000
        ms = ", ".join(f"{v * 1000:.1f}" for v in vals)
        print(f"[admtail] {name}: {ms} ms (median {med:.1f})", flush=True)

    # Numeric agreement of the two compositions (same session/device).
    if not dead & {"chunk_tail", "chunk_chain"}:
        a = np.asarray(chunk_tail(ry, ru, rv, dys[0], du, dv, pb, True)[0])
        b = np.asarray(chunk_chain(ry, ru, rv, dys[0], du, dv, pb, True)[0])
        rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-6))
        print(f"[admtail] tail-vs-chain packed max_rel_err: {rel:.3g}",
              flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
