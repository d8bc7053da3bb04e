"""In-session A/B: ADM Pallas kernel — shared-roll column convs + stacked
row-filter matmul (new) vs the round-3a form (old, loaded from a file copy of
the previous git revision). Session throughput varies ~25% (CLAUDE.md), so
only interleaved same-process numbers count.

Usage:
  git show <old-rev>:rtvqa_tpu/kernels/adm_pallas.py > /tmp/adm_pallas_old.py
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_adm_ab.py
"""

from __future__ import annotations

import importlib.util
import time
import traceback

import numpy as np

H, W = 1080, 1920
N = 128
REPS = 3
OLD_PATH = "/tmp/adm_pallas_old.py"


def load_old():
    spec = importlib.util.spec_from_file_location("adm_pallas_old", OLD_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    t0 = time.perf_counter()

    def note(msg):
        print(f"[adm] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench

    gen, distort = bench.device_frame_fns(N, H, W)
    ry, ru, rv = gen(0)
    dy = distort(ry, 1)
    np.asarray(dy[0, 0, :8])
    note("inputs synthesized on-device")

    from rtvqa_tpu.kernels import adm_pallas as new_mod

    old_mod = load_old()

    # De-memoization: distinct tiny bias per rep (adm input is f32-converted
    # internally; a unique scalar offset on dy changes the program inputs).
    tags = [jnp.float32(k * 1e-6) for k in range(2 * REPS + 2)]

    def make_run(mod):
        @jax.jit
        def run(ryy, dyy, tag):
            out = mod.adm_features_pallas(
                ryy.astype(jnp.float32), dyy.astype(jnp.float32) + tag
            )
            return out["adm2"]
        return lambda tag: np.asarray(run(ry, dy, tag))

    runs = {"new": make_run(new_mod), "old": make_run(old_mod)}
    outs = {}
    times = {k: [] for k in runs}
    try:
        for i, (name, fn) in enumerate(runs.items()):
            outs[name] = fn(tags[2 * REPS + i])
            note(f"warm {name}")
        for r in range(REPS):
            for i, (name, fn) in enumerate(runs.items()):
                t1 = time.perf_counter()
                fn(tags[2 * r + i])
                times[name].append(time.perf_counter() - t1)
        for name, vals in times.items():
            ms = ", ".join(f"{v * 1000:.1f}" for v in vals)
            print(f"[adm] adm4scales[{name}]: {ms} ms "
                  f"(median {sorted(vals)[len(vals)//2]*1000:.1f})", flush=True)
        d = np.max(np.abs(outs["new"] - outs["old"]))
        print(f"[adm] adm2 max_abs_diff: {d:.3g}", flush=True)
    except Exception:
        traceback.print_exc()
        return 1

    # --- the two complexity components the round-3c profiler missed --------
    # (its jits closed over the big device arrays -> HTTP 413; arrays must be
    # ARGUMENTS, CLAUDE.md)
    try:
        from rtvqa_tpu.ops.color import yuv420_to_gray, yuv420_to_rgb
        from rtvqa_tpu.ops.histogram import color_entropy
        from rtvqa_tpu.ops.resize import resize_bilinear

        @jax.jit
        def conv_gray(yy, uu, vv, tag):
            return jnp.sum(yuv420_to_gray(yy, uu, vv) + tag)

        @jax.jit
        def color_path(yy, uu, vv, tag):
            rgb = yuv420_to_rgb(yy, uu, vv) + tag
            rgb_rs = resize_bilinear(jnp.moveaxis(rgb, -1, 1), 64, 64)
            return jnp.sum(color_entropy(jnp.moveaxis(rgb_rs, 1, -1)))

        for name, fn in (("yuv420_to_gray", conv_gray),
                         ("rgb+resize+color_entropy", color_path)):
            np.asarray(fn(ry, ru, rv, tags[-1]))
            t1 = time.perf_counter()
            for r in range(REPS):
                np.asarray(fn(ry, ru, rv, tags[r]))
            dt = (time.perf_counter() - t1) / REPS
            print(f"[adm] {name}: {dt * 1000:.1f} ms", flush=True)
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
