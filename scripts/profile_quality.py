"""On-device breakdown of the quality phase (dev tool, run on the TPU).

Measures, in ONE process (the tunnel charges a large per-process first-fetch
sync — CLAUDE.md), with inputs synthesized on-device and reps de-memoized by
tiny distinct operands:

* the full fused chunk program (``_program_chunk`` — the production per-chunk
  dispatch), and
* its pieces: the fused VIF0+PSNR+SSIM+motion kernel, the VIF scale 1-3
  chain, ADM.

Usage: python scripts/profile_quality.py [N_FRAMES]
"""

from __future__ import annotations

import sys
import time

import numpy as np

H, W = 1080, 1920
N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
REPS = 2


def main():
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    t0 = time.perf_counter()

    def note(msg):
        print(f"[prof] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench

    gen, distort = bench.device_frame_fns(N, H, W)
    ry, ru, _rv = gen(0)
    dy = distort(ry, 1)
    np.asarray(dy[0, 0, :8])
    note("inputs synthesized on-device")

    fill = jax.jit(lambda c: jnp.full((H, W), c, jnp.float32))
    blurs = [fill(np.float32(1e-3 * (k + 1))) for k in range(REPS + 1)]

    def timeit(name, fn, variants):
        fn(variants[-1])
        t1 = time.perf_counter()
        for k in range(REPS):
            fn(variants[k])
        dt = (time.perf_counter() - t1) / REPS
        print(f"[prof] {name}: {dt * 1000:.1f} ms ({N / dt:.1f} f/s)", flush=True)
        return dt

    # --- full fused chunk program ------------------------------------------
    from rtvqa_tpu.metrics.full_reference import _program_chunk

    def run_chunk(blur):
        packed, _ = _program_chunk(ry, ru, ru, dy, ru, ru, blur, True)
        np.asarray(packed)

    t_chunk = timeit("fused chunk (quality phase total)", run_chunk, blurs)

    # --- round-3i A/B: raw int8 inputs vs the old astype-f32 dataflow -------
    # chunk_old reproduces the pre-3i program exactly: the astype runs INSIDE
    # the jitted program, so the kernels take the f32 stage_raw path.
    from rtvqa_tpu.metrics.full_reference import _program_chunk_body

    @jax.jit
    def chunk_old(ry_, ru_, rv_, dy_, du_, dv_, blur):
        f32 = lambda a: a.astype(jnp.float32)  # noqa: E731
        return _program_chunk_body(
            f32(ry_), f32(ru_), f32(rv_), f32(dy_), f32(du_), f32(dv_),
            blur, True,
        )

    def run_chunk_old(blur):
        packed, _ = chunk_old(ry, ru, ru, dy, ru, ru, blur)
        np.asarray(packed)

    timeit("fused chunk OLD (astype-f32 in-program)", run_chunk_old, blurs)
    timeit("fused chunk (re-run, drift check)", run_chunk, blurs)

    # --- pieces -------------------------------------------------------------
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas

    def run_fq(blur):
        fq = quality_fused_pallas(ry, ru, ru, dy, ru, ru, blur)
        np.asarray(
            jnp.stack([fq["vif_scale0"], fq["sse_y"], fq["ssim_y_sum"], fq["sad_sum"]])
        )

    t_fq = timeit("quality_fused_pallas (VIF0+A)", run_fq, blurs)

    from rtvqa_tpu.kernels.vif_pallas import vif_scale_pallas

    ryf = ry.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)

    @jax.jit
    def vif_chain(r0, d0, tag):
        out = []
        r, d = r0 + tag * 1e-30, d0
        for scale in (1, 2, 3):
            v, r, d = vif_scale_pallas(r, d, scale)
            out.append(v)
        return jnp.stack(out)

    fq0 = quality_fused_pallas(ry, ru, ru, dy, ru, ru, blurs[0])
    dec_r, dec_d = fq0["dec_ref"], fq0["dec_dis"]
    jax.block_until_ready((dec_r, dec_d))

    def run_vif123(k):
        np.asarray(vif_chain(dec_r, dec_d, jnp.float32(k)))

    timeit("VIF scales 1-3 chain", run_vif123, list(range(REPS + 1)))

    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas

    @jax.jit
    def adm(r, d, tag):
        return adm_features_pallas(r + tag * 1e-30, d)["adm2"]

    def run_adm(k):
        np.asarray(adm(ryf, dyf, jnp.float32(k)))

    timeit("ADM all scales (f32 inputs)", run_adm, list(range(REPS + 1)))

    # Production dtype (round 3i): raw uint8 in, int8-bitcast DMA. Distinct
    # dis variants de-memoize the tunnel.
    adm8 = jax.jit(lambda r, d: adm_features_pallas(r, d)["adm2"])
    dys = [distort(ry, k + 2) for k in range(REPS + 1)]
    jax.block_until_ready(dys)

    def run_adm8(d):
        np.asarray(adm8(ry, d))

    timeit("ADM all scales (uint8 inputs)", run_adm8, dys)

    print(f"[prof] chunk total {t_chunk*1000:.1f} ms; fused VIF0+A {t_fq*1000:.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
