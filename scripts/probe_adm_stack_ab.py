"""On-device A/B: round-4 ADM lane-filter M-stacking + pooling golf vs the
committed kernel (loaded from git as a parallel module) — same process,
interleaved reps, distinct uint8 inputs, in-session floor (CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_adm_stack_ab.py [REF]
where REF is the git rev holding the OLD kernel (default HEAD).
"""

from __future__ import annotations

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
         f"{ref}:rtvqa_tpu/kernels/adm_pallas.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = "/tmp/adm_pallas_old.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("adm_pallas_old", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["adm_pallas_old"] = mod
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
        print(f"[admstk] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench
    from rtvqa_tpu.kernels import adm_pallas as new_mod

    old_mod = load_old(ref)

    gen, distort = bench.device_frame_fns(N, H, W)
    ry = gen(0)[0]
    dys = [distort(ry, 10 + k) for k in range(REPS + 1)]
    jax.block_until_ready(dys)
    np.asarray(dys[0][0, 0, :8])
    note("inputs on-device")

    import functools

    @functools.partial(jax.jit, static_argnames=("which", "tail"))
    def adm(dy, which, tail):
        fn = new_mod.adm_features_pallas if which == "new" \
            else old_mod.adm_features_pallas
        return fn(ry, dy, tail=tail)["adm2"]

    @jax.jit
    def tiny(a, tag):
        return a[0, 0, :8].astype(jnp.float32) + tag

    tags = [jnp.float32(k * 1e-6) for k in range(64)]
    runs = {
        "floor": lambda k: np.asarray(tiny(ry, tags[k % 64])),
        "adm_new": lambda k: np.asarray(adm(dys[k % len(dys)], "new", True)),
        "adm_old": lambda k: np.asarray(adm(dys[k % len(dys)], "old", True)),
        "adm_new_chain": lambda k: np.asarray(
            adm(dys[k % len(dys)], "new", False)),
        "adm_old_chain": lambda k: np.asarray(
            adm(dys[k % len(dys)], "old", False)),
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
        print(f"[admstk] {name}: {ms} ms (median {med:.1f})", flush=True)

    if not dead & {"adm_new", "adm_old"}:
        a = np.asarray(adm(dys[0], "new", True))
        b = np.asarray(adm(dys[0], "old", True))
        rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-6))
        print(f"[admstk] new-vs-old adm2 max_rel_err: {rel:.3g}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
