"""On-device A/B: VIF scales 1-3 as the round-4 per-frame tail kernel vs the
round-3 per-scale chain, inside the production fused chunk program, plus
isolated timings of each quality-phase component.

Methodology (CLAUDE.md): everything in ONE process, interleaved reps,
distinct inputs per rep (the tunnel memoizes identical executions), a
measured per-call floor subtracted mentally when comparing standalone
numbers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_vif_tail_ab.py
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
        print(f"[tailab] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

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
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas
    from rtvqa_tpu.kernels.vif_pallas import vif_scale_pallas, vif_tail_pallas
    from rtvqa_tpu.metrics.full_reference import _chunk_fused_tpu

    chunk_tail = jax.jit(functools.partial(
        _chunk_fused_tpu, vif_egl=None, adm_egl=None, vif_tail=True))
    chunk_chain = jax.jit(functools.partial(
        _chunk_fused_tpu, vif_egl=None, adm_egl=None, vif_tail=False))

    # Pre-computed dec outputs for the isolated tail/chain timings.
    fq = quality_fused_pallas(ry, ru, rv, dys[-1], du, dv, pb, crop=False)
    dec_r, dec_d = fq["dec_ref"], fq["dec_dis"]
    dec_ds = [quality_fused_pallas(ry, ru, rv, d, du, dv, pb,
                                   crop=False)["dec_dis"] for d in dys]
    jax.block_until_ready(dec_ds)
    hs, ws = (H + 1) // 2, (W + 1) // 2

    @jax.jit
    def tail_only(r, d):
        out = vif_tail_pallas(r, d, h=hs, w=ws)
        return out["vif_scale1"] + out["vif_scale2"] + out["vif_scale3"]

    @jax.jit
    def chain_only(r, d):
        h2, w2 = hs, ws
        tot = 0.0
        for scale in (1, 2, 3):
            v, r, d = vif_scale_pallas(r, d, scale, h=h2, w=w2, crop=False)
            h2, w2 = (h2 + 1) // 2, (w2 + 1) // 2
            tot = tot + v
        return tot

    @jax.jit
    def fused_only(dy):
        out = quality_fused_pallas(ry, ru, rv, dy, du, dv, pb)
        return out["vif_scale0"] + out["sse_y"] + out["sad_sum"]

    @jax.jit
    def adm_only(dy):
        out = adm_features_pallas(ry, dy)
        return out["adm2"]

    @jax.jit
    def tiny(a, tag):
        return a[0, 0, :8].astype(jnp.float32) + tag

    tags = [jnp.float32(k * 1e-6) for k in range(64)]
    runs = {
        "floor": lambda k: np.asarray(tiny(ry, tags[k % 64])),
        "chunk_tail": lambda k: np.asarray(
            chunk_tail(ry, ru, rv, dys[k % len(dys)], du, dv, pb, True)[0]),
        "chunk_chain": lambda k: np.asarray(
            chunk_chain(ry, ru, rv, dys[k % len(dys)], du, dv, pb, True)[0]),
        "fused_only": lambda k: np.asarray(fused_only(dys[k % len(dys)])),
        "adm_only": lambda k: np.asarray(adm_only(dys[k % len(dys)])),
        "tail_only": lambda k: np.asarray(
            tail_only(dec_r, dec_ds[k % len(dec_ds)])),
        "chain_only": lambda k: np.asarray(
            chain_only(dec_r, dec_ds[k % len(dec_ds)])),
    }
    for name, fn in runs.items():
        fn(REPS)
        note(f"warm {name}")
    times = {name: [] for name in runs}
    for r in range(REPS):
        for name, fn in runs.items():
            t1 = time.perf_counter()
            fn(r)
            times[name].append(time.perf_counter() - t1)
    for name, vals in times.items():
        med = sorted(vals)[len(vals) // 2] * 1000
        ms = ", ".join(f"{v * 1000:.1f}" for v in vals)
        print(f"[tailab] {name}: {ms} ms (median {med:.1f})", flush=True)

    # Numeric agreement of the two chunk compositions (same session/device).
    a = np.asarray(chunk_tail(ry, ru, rv, dys[0], du, dv, pb, True)[0])
    b = np.asarray(chunk_chain(ry, ru, rv, dys[0], du, dv, pb, True)[0])
    rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-6))
    print(f"[tailab] tail-vs-chain packed max_rel_err: {rel:.3g}", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
