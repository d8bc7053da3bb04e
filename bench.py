"""Headline benchmark: 1080p frames/sec/chip, full metric suite.

Measures the fused on-device program (eight-metric complexity suite + native
PSNR + SSIM + VMAF features VIF/ADM/motion) over synthetic 1080p YUV420 frame
batches on one chip, against a vectorized NumPy CPU implementation of the
same pipeline (proxy for the reference's OpenCV/ffmpeg CPU path — the
reference itself cannot run here: no cv2/ffmpeg binaries, SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

H, W = 1080, 1920
N_DEVICE = 8    # frames per timed device batch
N_CPU = 2       # frames for the CPU baseline (extrapolated)
REPS = 2


def make_frames(n, h=H, w=W, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 3 + yy * 2) % 256
    y = np.stack([(base + 7 * i) % 256 for i in range(n)]).astype(np.uint8)
    y = np.clip(y.astype(np.int16) + rng.integers(0, 8, y.shape), 0, 255).astype(np.uint8)
    u = rng.integers(100, 156, (n, h // 2, w // 2), np.uint8)
    v = rng.integers(100, 156, (n, h // 2, w // 2), np.uint8)
    return y, u, v


def device_pipeline():
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.metrics.complexity import complexity_suite as _suite
    from rtvqa_tpu.metrics.quality import psnr_frames, ssim_frames
    from rtvqa_tpu.vmaf.adm import adm_features
    from rtvqa_tpu.vmaf.motion import motion_features
    from rtvqa_tpu.vmaf.vif import vif_features

    @jax.jit
    def quality_and_vmaf(ry, ru, rv, dy, du, dv):
        out = {}
        out.update(psnr_frames(ry, ru, rv, dy, du, dv))
        out.update(ssim_frames(ry, ru, rv, dy, du, dv))
        ryf = ry.astype(jnp.float32)
        dyf = dy.astype(jnp.float32)
        out.update(vif_features(ryf, dyf))
        out.update(adm_features(ryf, dyf))
        out.update(motion_features(ryf))
        return out

    motion_impl = "pallas" if jax.default_backend() != "cpu" else "xla"

    def run(ry, ru, rv, dy, du, dv, ts, n):
        # Serialize the two fused programs: concurrent execution of the
        # complexity suite and the quality/VMAF program at 1080p doubles the
        # peak HBM footprint and can crash the worker.
        comp = _suite(
            ry, ru, rv, ts, n, resize_h=64, resize_w=64, motion_impl=motion_impl
        )
        comp = jax.tree.map(np.asarray, comp)
        qual = quality_and_vmaf(ry, ru, rv, dy, du, dv)
        qual = jax.tree.map(np.asarray, qual)
        return comp, qual

    return run


def cpu_baseline(ry, dy):
    """Vectorized NumPy equivalent of the hot per-frame path (proxy for the
    reference's OpenCV C++ kernels on this host)."""
    import scipy.fft
    import scipy.ndimage as ndi

    n = ry.shape[0]
    for i in range(n):
        ref = ry[i].astype(np.float32)
        dis = dy[i].astype(np.float32)
        # complexity: resize 64x64 (strided mean proxy), whole-frame dct, hist
        small = ref[:1024, :1792].reshape(64, 16, 64, 28).mean((1, 3))
        d = scipy.fft.dct(scipy.fft.dct(small, axis=0, norm="ortho"), axis=1, norm="ortho")
        _ = (d * d).sum()
        hist, _ = np.histogram(ref, bins=256, range=(0, 256))
        p = hist / hist.sum()
        _ = -(p[p > 0] * np.log2(p[p > 0])).sum()
        gx = ndi.sobel(small, 1)
        gy = ndi.sobel(small, 0)
        _ = ((np.abs(gx) + np.abs(gy)) > 200).sum()
        # block matching 16x16, radius 4 (reduced vs device radius 8)
        prev = ry[i - 1].astype(np.float32) if i else ref
        best = None
        refc = ref[:1072]  # crop to a multiple of the 16px block
        for dyy in range(-4, 5):
            for dxx in range(-4, 5):
                shifted = np.roll(np.roll(prev, dyy, 0), dxx, 1)[:1072]
                sad = np.abs(refc - shifted).reshape(67, 16, 120, 16).sum((1, 3))
                best = sad if best is None else np.minimum(best, sad)
        # quality: psnr + ssim window stats
        diff = ref - dis
        _ = (diff * diff).mean()
        mu_r = ndi.uniform_filter(ref, 8)
        mu_d = ndi.uniform_filter(dis, 8)
        _ = ndi.uniform_filter(ref * dis, 8) - mu_r * mu_d
        # vif scale 0 moments
        g = ndi.gaussian_filter(ref, 17 / 5.0)
        _ = ndi.gaussian_filter(ref * ref, 17 / 5.0) - g * g


def main():
    import jax

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    # Distinct inputs per rep: the execution tunnel memoizes identical
    # (executable, inputs) calls, so repeated same-input timing reads as
    # near-zero. Results are fully materialized to the host inside the
    # timed region.
    variants = []
    for rep in range(REPS + 1):
        ry, ru, rv = make_frames(N_DEVICE, seed=rep)
        dy = np.clip(
            ry.astype(np.int16)
            + np.random.default_rng(100 + rep).integers(-4, 5, ry.shape),
            0, 255,
        ).astype(np.uint8)
        variants.append((
            jax.device_put(ry), jax.device_put(ru), jax.device_put(rv),
            jax.device_put(dy), jax.device_put(ru), jax.device_put(rv),
        ))
    jax.block_until_ready(variants)
    ts = (np.arange(N_DEVICE) * 33.3).astype(np.float32)
    n_valid = np.int32(N_DEVICE)

    run = device_pipeline()

    # Warmup/compile on the spare variant.
    run(*variants[-1], ts, n_valid)

    t0 = time.perf_counter()
    for rep in range(REPS):
        run(*variants[rep], ts, n_valid)
    dt = (time.perf_counter() - t0) / REPS
    device_fps = N_DEVICE / dt
    ry, dy = np.asarray(variants[0][0]), np.asarray(variants[0][3])

    t0 = time.perf_counter()
    cpu_baseline(ry[:N_CPU], dy[:N_CPU])
    cpu_dt = time.perf_counter() - t0
    cpu_fps = N_CPU / cpu_dt

    print(
        json.dumps(
            {
                "metric": "1080p_full_suite_frames_per_sec_per_chip",
                "value": round(device_fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(device_fps / cpu_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
