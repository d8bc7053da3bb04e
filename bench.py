"""Headline benchmark: 1080p frames/sec/chip, full metric suite.

Measures the fused on-device programs (eight-metric complexity suite with the
Pallas motion kernel + native PSNR/SSIM + VMAF features VIF/ADM/motion) over
synthetic 1080p YUV420 frame batches on one chip, against a vectorized NumPy
CPU implementation of the same pipeline (proxy for the reference's
OpenCV/ffmpeg CPU path — the reference itself cannot run here: no cv2/ffmpeg
binaries, SURVEY.md §6).

Measurement notes (all learned the hard way on the axon TPU tunnel):
* distinct inputs per rep + full host materialization inside the timed
  region — the tunnel memoizes identical executions and `block_until_ready`
  can return before real completion;
* the two fused programs are measured in SEPARATE subprocesses with retries —
  the remote worker occasionally crashes under heavy program churn, and a
  crashed client cannot recover in-process. Full-suite throughput combines
  the phase times (they run serialized in production too, bounding HBM peak).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

H, W = 1080, 1920
N_DEVICE = 128   # frames per batch — the fused quality chunk program and the
                 # complexity suite both compile at 128 1080p frames (the
                 # Pallas VIF+ADM kernels cut the quality HBM peak, round 2)
REPS = 2
N_CPU = 2        # frames for the CPU baseline (extrapolated)


def make_frames(n, h=H, w=W, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 3 + yy * 2) % 256
    y = np.stack([(base + 7 * i) % 256 for i in range(n)]).astype(np.uint8)
    y = np.clip(y.astype(np.int16) + rng.integers(0, 8, y.shape), 0, 255).astype(np.uint8)
    u = rng.integers(100, 156, (n, h // 2, w // 2), np.uint8)
    v = rng.integers(100, 156, (n, h // 2, w // 2), np.uint8)
    return y, u, v


def _variants(n_variants, distort=False):
    import jax

    out = []
    for rep in range(n_variants):
        ry, ru, rv = make_frames(N_DEVICE, seed=rep)
        if distort:
            dy = np.clip(
                ry.astype(np.int16)
                + np.random.default_rng(100 + rep).integers(-4, 5, ry.shape),
                0, 255,
            ).astype(np.uint8)
            out.append(tuple(jax.device_put(x) for x in (ry, ru, rv, dy, ru, rv)))
        else:
            out.append(tuple(jax.device_put(x) for x in (ry, ru, rv)))
    jax.block_until_ready(out)
    return out


def phase_complexity() -> float:
    """Seconds per N_DEVICE-frame batch for the complexity suite."""
    import jax

    from rtvqa_tpu.metrics.complexity import complexity_suite_packed
    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    motion_impl = "pallas" if jax.default_backend() != "cpu" else "xla"
    ts = (np.arange(N_DEVICE) * 33.3).astype(np.float32)
    n = np.int32(N_DEVICE)
    variants = _variants(REPS + 1)

    def run(v):
        # Packed output: ONE device->host fetch (the tunnel charges a full
        # RPC round trip per fetched array).
        return np.asarray(
            complexity_suite_packed(
                *v, ts, n, resize_h=64, resize_w=64, motion_impl=motion_impl
            )
        )

    run(variants[-1])  # warmup/compile
    t0 = time.perf_counter()
    for rep in range(REPS):
        run(variants[rep])
    return (time.perf_counter() - t0) / REPS


def phase_quality() -> float:
    """Seconds per N_DEVICE-frame batch for PSNR+SSIM+VMAF features,
    using the production fused chunk program (metrics.full_reference)."""
    import jax
    import numpy as _np

    from rtvqa_tpu.metrics.full_reference import _program_chunk
    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    variants = _variants(REPS + 1, distort=True)
    zero_blur = jax.device_put(_np.zeros((H, W), _np.float32))

    def run(v):
        packed, _ = _program_chunk(*v, zero_blur, True)
        _np.asarray(packed)

    run(variants[-1])
    t0 = time.perf_counter()
    for rep in range(REPS):
        run(variants[rep])
    return (time.perf_counter() - t0) / REPS


def cpu_baseline_secs() -> float:
    """Seconds per frame for a vectorized NumPy equivalent of the hot path."""
    import scipy.fft
    import scipy.ndimage as ndi

    ry, _, _ = make_frames(N_CPU, seed=0)
    dy = np.clip(
        ry.astype(np.int16) + np.random.default_rng(1).integers(-4, 5, ry.shape),
        0, 255,
    ).astype(np.uint8)
    t0 = time.perf_counter()
    for i in range(N_CPU):
        ref = ry[i].astype(np.float32)
        dis = dy[i].astype(np.float32)
        small = ref[:1024, :1792].reshape(64, 16, 64, 28).mean((1, 3))
        d = scipy.fft.dct(scipy.fft.dct(small, axis=0, norm="ortho"), axis=1, norm="ortho")
        _ = (d * d).sum()
        hist, _ = np.histogram(ref, bins=256, range=(0, 256))
        p = hist / hist.sum()
        _ = -(p[p > 0] * np.log2(p[p > 0])).sum()
        gx = ndi.sobel(small, 1)
        gy = ndi.sobel(small, 0)
        _ = ((np.abs(gx) + np.abs(gy)) > 200).sum()
        prev = ry[i - 1].astype(np.float32) if i else ref
        best = None
        refc = ref[:1072]
        for dyy in range(-4, 5):
            for dxx in range(-4, 5):
                shifted = np.roll(np.roll(prev, dyy, 0), dxx, 1)[:1072]
                sad = np.abs(refc - shifted).reshape(67, 16, 120, 16).sum((1, 3))
                best = sad if best is None else np.minimum(best, sad)
        diff = ref - dis
        _ = (diff * diff).mean()
        mu_r = ndi.uniform_filter(ref, 8)
        mu_d = ndi.uniform_filter(dis, 8)
        _ = ndi.uniform_filter(ref * dis, 8) - mu_r * mu_d
        g = ndi.gaussian_filter(ref, 17 / 5.0)
        _ = ndi.gaussian_filter(ref * ref, 17 / 5.0) - g * g
    return (time.perf_counter() - t0) / N_CPU


def make_video_frames(n, variant=0, h=H, w=W):
    """Camera-plausible 1080p content: smooth structured luma with global
    motion and a few moving objects — NOT per-pixel noise. Dense noise makes
    x264 emit ~100 Mbps bitstreams whose 1-core decode crawls at ~2 fps and
    says nothing about real footage (CRF-18 1080p is typically 5-15 Mbps)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.empty((n, h, w), np.uint8)
    for i in range(n):
        t = i + 31.0 * variant
        img = (
            120.0
            + 55.0 * np.sin(2 * np.pi * (xx + 2.5 * t) / 240.0)
            + 35.0 * np.cos(2 * np.pi * (yy + 1.5 * t) / 180.0)
        )
        # Two moving high-contrast blocks (motion + edges for the metrics).
        bx = int(300 + 6 * t) % (w - 200)
        by = int(200 + 4 * t) % (h - 200)
        img[by : by + 160, bx : bx + 160] = 230.0
        img[(h - by - 160) : (h - by), (w - bx - 160) : (w - bx)] = 25.0
        frames[i] = np.clip(img, 0, 255).astype(np.uint8)
    u = np.full((n, h // 2, w // 2), 120, np.uint8)
    v = np.full((n, h // 2, w // 2), 132, np.uint8)
    return frames, u, v


def _e2e_clip_cache(variant: int, n: int = 128) -> tuple[str, str]:
    """Build (once, cached on disk) a real 1080p H.264 clip pair for the
    end-to-end benchmark: ref encoded from synthetic YUV, dis = CRF-28
    re-encode. Distinct content per variant (the tunnel memoizes identical
    executions)."""
    import hashlib

    from rtvqa_tpu.io import video as vio

    cache = os.path.expanduser("~/.cache/rtvqa_bench")
    os.makedirs(cache, exist_ok=True)
    tag = hashlib.md5(f"e2e-v3-{variant}-{n}-{H}x{W}".encode()).hexdigest()[:10]
    ref = os.path.join(cache, f"ref_{tag}.mp4")
    dis = os.path.join(cache, f"dis_{tag}.mp4")
    if not (os.path.exists(ref) and os.path.exists(dis)):
        y, u, v = make_video_frames(n, variant)
        from fractions import Fraction

        vio.encode_raw_yuv420(ref, y, u, v, fps=Fraction(30, 1), crf=18, preset="veryfast")
        vio.transcode(ref, dis, crf=28, preset="veryfast")
    return ref, dis


def phase_e2e() -> float:
    """Seconds per frame, END-TO-END: native 1-core decode of both streams +
    full quality suite (every frame) + complexity suite (frame_interval=10)
    through the combined single-decode-pass engine — the honest whole-pipeline
    number (VERDICT r1: the headline bench excludes IO)."""
    from rtvqa_tpu.metrics.full_reference import analyze_combined
    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    def run(variant):
        ref, dis = _e2e_clip_cache(variant)
        t0 = time.perf_counter()
        qual, _comp = analyze_combined(
            ref, dis, frame_interval=10, resize_width=64, resize_height=64
        )
        dt = time.perf_counter() - t0
        return dt, int(qual["n_frames"])

    run(0)  # warmup/compile on variant 0
    total_dt, total_n = 0.0, 0
    for variant in range(1, REPS + 1):
        dt, n = run(variant)
        total_dt += dt
        total_n += n
    # Decode-only floor (both streams, no device work) for the split report.
    from rtvqa_tpu.io.stream import VideoStream

    t0 = time.perf_counter()
    for path in _e2e_clip_cache(1):
        vs = VideoStream(path, 1, 64)
        for _ in vs:
            pass
    decode_dt = time.perf_counter() - t0
    # stdout so the parent process (which captures the subprocess) can relay.
    print(
        f"[bench] e2e: {total_n} frames in {total_dt:.2f}s "
        f"({total_n / total_dt:.1f} f/s); decode-only floor for one rep: "
        f"{decode_dt:.2f}s ({(total_n / REPS) / decode_dt:.1f} f/s)"
    )
    return total_dt / total_n


def _run_phase_subprocess(phase: str, attempts: int = 3) -> float:
    """Run one measurement phase in a fresh process (worker crashes recover)."""
    for attempt in range(attempts):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in proc.stdout.strip().splitlines():
            if line.startswith("[bench] "):
                sys.stderr.write(line + "\n")
        for line in reversed(proc.stdout.strip().splitlines()):
            if line.startswith("PHASE_SECONDS "):
                return float(line.split()[1])
        sys.stderr.write(
            f"[bench] phase {phase} attempt {attempt + 1} failed:\n{proc.stderr[-2000:]}\n"
        )
    raise RuntimeError(f"phase {phase} failed after {attempts} attempts")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--phase", choices=["complexity", "quality", "e2e"], default=None)
    parser.add_argument(
        "--e2e", action="store_true",
        help="Report the decode-included end-to-end fps instead of the "
        "device-program headline (runs in a subprocess with retries).",
    )
    args = parser.parse_args()

    if args.phase == "complexity":
        print(f"PHASE_SECONDS {phase_complexity()}")
        return 0
    if args.phase == "quality":
        print(f"PHASE_SECONDS {phase_quality()}")
        return 0
    if args.phase == "e2e":
        print(f"PHASE_SECONDS {phase_e2e()}")
        return 0

    if args.e2e:
        spf = _run_phase_subprocess("e2e")
        print(
            json.dumps(
                {
                    "metric": "1080p_e2e_decode_included_frames_per_sec_per_chip",
                    "value": round(1.0 / spf, 3),
                    "unit": "frames/sec/chip",
                    "vs_baseline": round((1.0 / spf) / (1.0 / cpu_baseline_secs()), 3),
                }
            )
        )
        return 0

    comp_dt = _run_phase_subprocess("complexity")
    qual_dt = _run_phase_subprocess("quality")
    total_dt = comp_dt + qual_dt  # serialized, as in production
    device_fps = N_DEVICE / total_dt
    cpu_fps = 1.0 / cpu_baseline_secs()

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
    return 0


if __name__ == "__main__":
    sys.exit(main())
