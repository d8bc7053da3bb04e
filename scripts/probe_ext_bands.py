"""On-device A/B: in-kernel band-matrix construction vs pre-built XLA band
operands (round 3f, ``vif_pallas.build_lane_bands``).

Hypothesis: Mosaic re-executes the iota-compare-add band construction in
EVERY grid cell (it cannot hoist tensor code across grid steps), so the
17-tap stats bands alone cost ~5M VPU elementwise ops per cell. Measures,
interleaved in ONE process at 128x1080p:

* fused quality kernel (VIF0+PSNR/SSIM/motion), ext_bands False vs True;
* the VIF scale 1-3 chain, ext_bands False vs True;
* ADM all-scales (fresh session baseline, unchanged);
* the production fused chunk program (_program_chunk, new defaults).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_ext_bands.py
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
        print(f"[xb] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

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
    from rtvqa_tpu.kernels.vif_pallas import vif_scale_pallas
    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas
    from rtvqa_tpu.metrics.full_reference import _program_chunk

    def run_fused(ext):
        def run(tag):
            out = quality_fused_pallas(
                ry, ru, rv, dy + tag, du, dv, pb, ext_bands=ext
            )
            return np.asarray(out["vif_scale0"] + out["sse_y"] + out["sad_sum"])
        return run

    # Scale 1-3 chain from half-res inputs (block-padded like production).
    hd, wd = (H + 1) // 2, (W + 1) // 2
    wq2 = 128 * (-(-wd // 128))
    hpad = 16 * (-(-hd // 16))

    @jax.jit
    def make_half(tag):
        r1 = jax.image.resize(ry.astype(jnp.float32), (N, hpad, wq2), "linear")
        d1 = r1 + tag
        return r1, d1

    r1, d1 = make_half(np.float32(0.5))
    np.asarray(r1[0, 0, :8])
    note("half-res staged")

    def run_vif123(ext):
        def run(tag):
            ref, dis = r1, d1 + tag
            h, w = hd, wd
            tot = None
            for scale in (1, 2, 3):
                v, ref, dis = vif_scale_pallas(
                    ref, dis, scale, h=h, w=w, crop=False, ext_bands=ext
                )
                h, w = (h + 1) // 2, (w + 1) // 2
                tot = v if tot is None else tot + v
            return np.asarray(tot)
        return run

    def run_adm(tag):
        out = adm_features_pallas(ry.astype(jnp.float32),
                                  dy.astype(jnp.float32) + tag)
        return np.asarray(out["adm2"])

    def run_chunk(tag):
        packed, _ = _program_chunk(ry, ru, rv, dy, ru, rv, pb + tag, True)
        return np.asarray(packed)

    runs = {
        "fused_inkernel": run_fused(False),
        "fused_extbands": run_fused(True),
        "vif123_inkernel": run_vif123(False),
        "vif123_extbands": run_vif123(True),
        "adm": run_adm,
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
        print(f"[xb] {name}: {ms} ms (median {med:.1f})", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
