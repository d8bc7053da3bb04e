"""On-device A/B: round-4b raw-luma VIF tail (quality kernel skips its dec
stage + dec HBM round trip) vs the committed dec-input tail composition,
same process, interleaved, distinct uint8 inputs, in-session floor.

The OLD composition is loaded from git as a parallel module (its kernel
imports resolve against the CURRENT kernels — quality_fused_pallas defaults
emit_dec=True, so the old chunk body runs unchanged).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/probe_raw_tail_ab.py [OLD_REF]
"""

from __future__ import annotations

import functools
import importlib.util
import subprocess
import sys
import time

import numpy as np

N, H, W = 128, 1080, 1920
REPS = 3


def load_old(ref: str):
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show",
         f"{ref}:rtvqa_tpu/metrics/full_reference.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = "/tmp/full_reference_old.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("full_reference_old", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["full_reference_old"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    t0 = time.perf_counter()

    def note(msg):
        print(f"[rawtail] {msg} (+{time.perf_counter() - t0:.1f}s)",
              flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench
    from rtvqa_tpu.metrics import full_reference as new_mod

    old_mod = load_old(ref)

    gen, distort = bench.device_frame_fns(N, H, W)
    ry, ru, rv = gen(0)
    dys = [distort(ry, 10 + k) for k in range(REPS + 1)]
    du = distort(ru, 2)
    dv = distort(rv, 3)
    pb = jax.jit(lambda: jnp.zeros((H, W), jnp.float32))()
    jax.block_until_ready(dys)
    np.asarray(dys[0][0, 0, :8])
    note("inputs on-device")

    chunk_new = jax.jit(functools.partial(
        new_mod._chunk_fused_tpu, vif_egl=None, adm_egl=None, vif_tail=True))
    chunk_old = jax.jit(functools.partial(
        old_mod._chunk_fused_tpu, vif_egl=None, adm_egl=None, vif_tail=True))

    from rtvqa_tpu.kernels.vif_pallas import vif_tail_pallas

    @jax.jit
    def tiny(a, tag):
        return a[0, 0, :8].astype(jnp.float32) + tag

    tags = [jnp.float32(k * 1e-6) for k in range(64)]
    runs = {
        "floor": lambda k: np.asarray(tiny(ry, tags[k % 64])),
        "tail_raw32": lambda k: np.asarray(vif_tail_pallas(
            ry, dys[k % len(dys)], h=H, w=W, raw=True,
            raw_ch1=32)["vif_scale1"]),
        "tail_raw64": lambda k: np.asarray(vif_tail_pallas(
            ry, dys[k % len(dys)], h=H, w=W, raw=True,
            raw_ch1=64)["vif_scale1"]),
        "chunk_raw": lambda k: np.asarray(
            chunk_new(ry, ru, rv, dys[k % len(dys)], du, dv, pb, True)[0]),
        "chunk_dec": lambda k: np.asarray(
            chunk_old(ry, ru, rv, dys[k % len(dys)], du, dv, pb, True)[0]),
    }
    dead = set()
    for name, fn in runs.items():
        try:
            fn(REPS)
            note(f"warm {name}")
        except Exception as e:
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
        print(f"[rawtail] {name}: {ms} ms (median {med:.1f})", flush=True)

    if not dead & {"chunk_raw", "chunk_dec"}:
        a = np.asarray(chunk_new(ry, ru, rv, dys[0], du, dv, pb, True)[0])
        b = np.asarray(chunk_old(ry, ru, rv, dys[0], du, dv, pb, True)[0])
        rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-6))
        print(f"[rawtail] raw-vs-dec packed max_rel_err: {rel:.3g}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
