"""On-device A/B round 2 (3f wave 2): cumulative ext-bands fused quality
kernel (now incl. SSIM row/pool bands) and the ADM col-band A/B.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_ext_bands2.py
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
        print(f"[xb2] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench

    gen, distort = bench.device_frame_fns(N, H, W)
    ry, ru, rv = gen(0)
    dy = distort(ry, 1)
    du = distort(ru, 2)
    dv = distort(rv, 3)
    pb = jax.jit(lambda: jnp.zeros((H, W), jnp.float32))()
    np.asarray(dy[0, 0, :8])
    note("inputs on-device")

    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas
    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas, adm_scale_pallas
    from rtvqa_tpu.metrics.full_reference import _program_chunk

    ryf = ry.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    np.asarray(ryf[0, 0, :8])

    def run_fused(ext):
        def run(tag):
            out = quality_fused_pallas(
                ry, ru, rv, dy + tag, du, dv, pb, ext_bands=ext
            )
            return np.asarray(out["vif_scale0"] + out["sse_y"] + out["sad_sum"])
        return run

    def run_adm(ext):
        def run(tag):
            # all 4 chained scales, like adm_features_pallas
            num = den = 0.0
            o, t = ryf, dyf + tag
            h, w = H, W
            for scale in range(4):
                n_s, d_s, o, t = adm_scale_pallas(
                    o, t, scale, h=h, w=w, crop=False, ext_bands=ext
                )
                h, w = (h + 1) // 2, (w + 1) // 2
                num = num + n_s
                den = den + d_s
            return np.asarray(num + den)
        return run

    def run_chunk(tag):
        packed, _ = _program_chunk(ry, ru, rv, dy, ru, rv, pb + tag, True)
        return np.asarray(packed)

    runs = {
        "fused_inkernel": run_fused(False),
        "fused_extbands2": run_fused(True),
        "adm_inkernel": run_adm(False),
        "adm_extbands": run_adm(True),
        "program_chunk": run_chunk,
    }
    tags = [jnp.float32(k * 1e-6) for k in range(len(runs) * (REPS + 2))]
    for idx, (name, fn) in enumerate(runs.items()):
        fn(tags[len(runs) * REPS + idx])
        note(f"warm {name}")
    times = {name: [] for name in runs}
    for r in range(REPS):
        for idx, (name, fn) in enumerate(runs.items()):
            t1 = time.perf_counter()
            fn(tags[len(runs) * r + idx])
            times[name].append(time.perf_counter() - t1)
    for name, vals in times.items():
        med = sorted(vals)[len(vals) // 2] * 1000
        ms = ", ".join(f"{v * 1000:.1f}" for v in vals)
        print(f"[xb2] {name}: {ms} ms (median {med:.1f})", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
