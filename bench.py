"""Headline benchmark: 1080p frames/sec/chip, full metric suite.

Measures the fused on-device programs (eight-metric complexity suite with the
Pallas motion kernel + native PSNR/SSIM + VMAF features VIF/ADM) over
synthetic 1080p YUV420 frame batches on one chip, against a vectorized NumPy
CPU implementation of the same hot kernels (proxy for the reference's
OpenCV/ffmpeg CPU path — the reference itself cannot run here: no cv2/ffmpeg
binaries, SURVEY.md §6).

Round-3 redesign (VERDICT r2 next #1 — the round-2 bench timed out, rc=124):
the whole measurement must survive the driver's wall-clock budget on the
axon tunnel, whose transport physics (CLAUDE.md) charge ~13-35 MB/s for
uploads and a highly variable per-process first-fetch sync. Therefore:

* ONE child process runs BOTH device phases — one first-fetch stall, paid
  up-front with an empty upload backlog;
* ~400 MB total upload instead of ~3.6 GB: a single staged ref-stream batch
  is shared by both phases and reused across reps; the distorted luma is
  synthesized ON DEVICE; reps are de-memoized (the tunnel memoizes identical
  (program, inputs) executions) by varying only tiny inputs (timestamps /
  the blur-carry frame);
* the parent enforces a hard overall budget (RTVQA_BENCH_BUDGET_S, default
  520 s), streams the child's phase results as they complete, and ALWAYS
  emits the JSON line — from measured phases when possible, falling back to
  the last-known-good record (flagged ``"partial": true`` with provenance)
  if a phase was killed by the deadline;
* the CPU baseline runs in the parent concurrently with the child.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``--validate`` runs Pallas-vs-XLA equivalence on the real device at 1080p
and 4K and writes a committed artifact (VERDICT r2 next #7).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

H, W = 1080, 1920
N_DEVICE = 128   # frames per batch — both fused programs compile at 128
                 # 1080p frames (the Pallas VIF+ADM kernels cut the quality
                 # HBM peak, round 2)
REPS = 2
N_CPU = 2        # frames for the CPU baseline (extrapolated)
BUDGET_S = float(os.environ.get("RTVQA_BENCH_BUDGET_S", "520"))
LASTGOOD = os.path.expanduser("~/.cache/rtvqa_bench/lastgood.json")
SECONDARY = os.path.expanduser("~/.cache/rtvqa_bench/secondary.json")
METRIC = "1080p_full_suite_frames_per_sec_per_chip"


def make_frames(n, h=H, w=W, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 3 + yy * 2) % 256
    y = np.stack([(base + 7 * i) % 256 for i in range(n)]).astype(np.uint8)
    y = np.clip(
        y.astype(np.int16) + rng.integers(0, 8, y.shape, dtype=np.int16), 0, 255
    ).astype(np.uint8)
    u = rng.integers(100, 156, (n, h // 2, w // 2), np.uint8)
    v = rng.integers(100, 156, (n, h // 2, w // 2), np.uint8)
    return y, u, v


def device_frame_fns(n, h, w):
    """Jitted on-device synthetic frame generators shared by every device
    phase (1080p headline, 4K phase, scripts/profile_*): same gradient+noise
    recipe as ``make_frames`` so all measurements see content-equivalent
    inputs. Returns (gen(seed) -> (y, u, v), distort(y, seed) -> dy)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(seed):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        fi = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 0)
        yy = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
        base = (xx * 3 + yy * 2 + 7 * fi) % 256
        noise = jax.random.randint(k1, (n, h, w), 0, 8, jnp.int32)
        y = jnp.clip(base + noise, 0, 255).astype(jnp.uint8)
        u = jax.random.randint(
            k2, (n, h // 2, w // 2), 100, 156, jnp.int32
        ).astype(jnp.uint8)
        v = jax.random.randint(
            k3, (n, h // 2, w // 2), 100, 156, jnp.int32
        ).astype(jnp.uint8)
        return y, u, v

    @jax.jit
    def distort(y, seed):
        noise = jax.random.randint(
            jax.random.PRNGKey(seed), y.shape, -4, 5, dtype=jnp.int16
        )
        return jnp.clip(y.astype(jnp.int16) + noise, 0, 255).astype(jnp.uint8)

    return gen, distort


# ---------------------------------------------------------------------------
# Child: both device phases in one process
# ---------------------------------------------------------------------------


def phase_all() -> int:
    """Run complexity + quality phases on the device; print PHASE_SECONDS
    lines as each completes (the parent parses them incrementally, so partial
    progress survives a deadline kill)."""
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.metrics.complexity import complexity_suite_packed
    from rtvqa_tpu.metrics.full_reference import _program_chunk
    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    t_start = time.perf_counter()

    def note(msg):
        print(f"[bench] {msg} (+{time.perf_counter() - t_start:.1f}s)", flush=True)

    # Pay the tunnel's per-process first-fetch sync cost NOW, while the
    # upload backlog is empty (CLAUDE.md "tunnel transport physics": the
    # first device->host fetch stalls for the whole buffered backlog plus a
    # variable sync cost; afterwards transfers run at the true wire rate).
    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    # ALL inputs synthesized ON DEVICE: the 398 MB ref batch took ~3 min of
    # host generation + wire upload (measured; the tunnel runs at 13-35
    # MB/s), and the measured kernels are content-independent (static
    # shapes, exact-SAD search, no data-dependent control flow) — the
    # same gradient+noise content as make_frames, built from iota + TPU PRNG.
    gen_ref, make_dis = device_frame_fns(N_DEVICE, H, W)
    ry, ru, rv = gen_ref(0)
    dy = make_dis(ry, 1)
    np.asarray(dy[0, 0, :8])  # tiny fetch: serializes the on-device synthesis
    note("inputs staged (whole batch synthesized on-device)")

    # --- complexity phase --------------------------------------------------
    motion_impl = "pallas" if jax.default_backend() != "cpu" else "xla"
    n = np.int32(N_DEVICE)
    # Distinct timestamps per rep defeat the tunnel's (program, inputs)
    # memoization at zero upload cost (the frame planes are reused).
    ts = [
        jax.device_put((np.arange(N_DEVICE) * 33.3 + rep).astype(np.float32))
        for rep in range(REPS + 1)
    ]

    def disp_c(t):
        return complexity_suite_packed(
            ry, ru, rv, t, n, resize_h=64, resize_w=64, motion_impl=motion_impl
        )

    np.asarray(disp_c(ts[-1]))  # warmup/compile
    note("complexity compiled + warm")
    # Depth-1 fetch pipeline, matching the production chunk loop
    # (full_reference._quality_chunk_loop): rep k's small-fetch RPC overlaps
    # rep k+1's in-flight execution (scripts/probe_pipeline_fetch.py:
    # complexity 77.3 -> 53.9 ms/rep, quality 137.8 -> 115.5). Every rep's
    # output is still materialized inside the timed region.
    t0 = time.perf_counter()
    prev = None
    for rep in range(REPS):
        out = disp_c(ts[rep])
        if prev is not None:
            np.asarray(prev)
        prev = out
    np.asarray(prev)
    comp_dt = (time.perf_counter() - t0) / REPS
    print(f"PHASE_SECONDS complexity {comp_dt}", flush=True)

    # --- quality phase -----------------------------------------------------
    # Distinct blur-carry frames per rep (generated on device from a scalar)
    # de-memoize the quality program, again at zero upload cost.
    fill = jax.jit(lambda c: jnp.full((H, W), c, jnp.float32))
    blurs = [fill(np.float32(1e-3 * (rep + 1))) for rep in range(REPS + 1)]

    def disp_q(blur):
        packed, _ = _program_chunk(ry, ru, rv, dy, ru, rv, blur, True)
        return packed

    np.asarray(disp_q(blurs[-1]))  # warmup/compile
    note("quality compiled + warm")
    t0 = time.perf_counter()
    prev = None
    for rep in range(REPS):
        out = disp_q(blurs[rep])
        if prev is not None:
            np.asarray(prev)
        prev = out
    np.asarray(prev)
    qual_dt = (time.perf_counter() - t0) / REPS
    print(f"PHASE_SECONDS quality {qual_dt}", flush=True)
    note("all phases done")
    return 0


def phase_4k() -> int:
    return phase_res(2160, 3840, "4k")


def phase_1440p() -> int:
    return phase_res(1440, 2560, "1440p")


def phase_res(h4: int, w4: int, label: str) -> int:
    """Wide-resolution device-program throughput, measured like the headline:
    quality chunks at the production auto_chunk (16 at 4K, 36 at 1440p —
    since round 5 both route through the fused Pallas quality kernel under a
    raised scoped-VMEM budget), complexity batched to the same HBM footprint
    as 128x1080p. Prints PHASE_SECONDS lines normalized to SECONDS PER FRAME
    so the parent can combine them."""
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.metrics.complexity import complexity_suite_packed
    from rtvqa_tpu.metrics.full_reference import _program_chunk, auto_chunk
    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    nq = auto_chunk(w4, h4)   # production chunk (16 at 4K, 36 at 1440p)
    nc = max(2, int(128 * (1080 * 1920) / (h4 * w4)) // 2 * 2)
    t_start = time.perf_counter()

    def note(msg):
        print(f"[bench] {msg} (+{time.perf_counter() - t_start:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    gen, distort = device_frame_fns(nc, h4, w4)
    y, u, v = gen(0)
    dy = distort(y[:nq], 1)
    np.asarray(dy[0, 0, :8])
    note(f"{label} inputs staged (quality chunk {nq}, complexity batch {nc})")

    ts = [
        jax.device_put((np.arange(nc) * 33.3 + rep).astype(np.float32))
        for rep in range(REPS + 1)
    ]
    n_valid = np.int32(nc)

    def disp_c(t):
        return complexity_suite_packed(
            y, u, v, t, n_valid, resize_h=64, resize_w=64, motion_impl="pallas"
        )

    np.asarray(disp_c(ts[-1]))
    note(f"{label} complexity compiled + warm")
    # Depth-1 fetch pipeline (see phase_all / the production chunk loop).
    t0 = time.perf_counter()
    prev = None
    for rep in range(REPS):
        out = disp_c(ts[rep])
        if prev is not None:
            np.asarray(prev)
        prev = out
    np.asarray(prev)
    comp_spf = (time.perf_counter() - t0) / REPS / nc
    print(f"PHASE_SECONDS complexity{label}_spf {comp_spf}", flush=True)

    fill = jax.jit(lambda c: jnp.full((h4, w4), c, jnp.float32))
    blurs = [fill(np.float32(1e-3 * (rep + 1))) for rep in range(REPS + 1)]
    # Slice the quality operands ONCE outside the timed loop (each slice is
    # its own tunnel program dispatch, ~40 ms fixed cost).
    yq, uq, vq = y[:nq], u[:nq], v[:nq]

    def disp_q(blur):
        packed, _ = _program_chunk(yq, uq, vq, dy, uq, vq, blur, True)
        return packed

    np.asarray(disp_q(blurs[-1]))
    note(f"{label} quality compiled + warm")
    t0 = time.perf_counter()
    prev = None
    for rep in range(REPS):
        out = disp_q(blurs[rep])
        if prev is not None:
            np.asarray(prev)
        prev = out
    np.asarray(prev)
    qual_spf = (time.perf_counter() - t0) / REPS / nq
    print(f"PHASE_SECONDS quality{label}_spf {qual_spf}", flush=True)
    fps = 1.0 / (comp_spf + qual_spf)
    print(f"[bench] {label} full-suite: {fps:.1f} f/s/chip "
          f"(quality {qual_spf*1000:.1f} ms/frame + complexity "
          f"{comp_spf*1000:.1f} ms/frame)", flush=True)
    _record_secondary(f"{label}_full_suite_frames_per_sec_per_chip", fps)
    print(json.dumps({
        "metric": f"{label}_full_suite_frames_per_sec_per_chip",
        "value": round(fps, 3), "unit": "frames/sec/chip",
    }))
    return 0


# ---------------------------------------------------------------------------
# CPU baseline proxy
# ---------------------------------------------------------------------------


def cpu_baseline_secs() -> float:
    """Seconds per frame for a vectorized NumPy equivalent of the hot path.

    NOTE (VERDICT r2 weak #6): this proxy covers the dominant kernels
    (block-match motion, DCT, histogram, Sobel, MSE/SSIM-style windows, one
    Gaussian moment pass) but is LIGHTER than the full reference pipeline (no
    ORB/Canny/color entropy/4-scale VIF/ADM) — so ``vs_baseline`` is a
    conservative-in-our-disfavor label of CPU-proxy speedup, not a measured
    reference-pipeline ratio. The JSON line carries this caveat.
    """
    import scipy.fft
    import scipy.ndimage as ndi

    ry, _, _ = make_frames(N_CPU, seed=0)
    dy = np.clip(
        ry.astype(np.int16)
        + np.random.default_rng(1).integers(-4, 5, ry.shape, dtype=np.int16),
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


# ---------------------------------------------------------------------------
# End-to-end (decode-included) phase — kept from round 2, opt-in via --e2e
# ---------------------------------------------------------------------------


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
    through the combined single-decode-pass engine — the honest
    whole-pipeline number. WIRE-bound on this dev tunnel (BASELINE.md)."""
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
    from rtvqa_tpu.io.stream import VideoStream

    t0 = time.perf_counter()
    for path in _e2e_clip_cache(1):
        vs = VideoStream(path, 1, 64)
        for _ in vs:
            pass
    decode_dt = time.perf_counter() - t0
    print(
        f"[bench] e2e: {total_n} frames in {total_dt:.2f}s "
        f"({total_n / total_dt:.1f} f/s); decode-only floor for one rep: "
        f"{decode_dt:.2f}s ({(total_n / REPS) / decode_dt:.1f} f/s)",
        flush=True,
    )
    print(f"PHASE_SECONDS e2e {total_dt / total_n}", flush=True)
    return total_dt / total_n


# ---------------------------------------------------------------------------
# Hardware validation artifact (VERDICT r2 next #7)
# ---------------------------------------------------------------------------


def run_validate(out_path: str) -> int:
    """Pallas==XLA equivalence ON THE REAL DEVICE at 1080p and 4K; writes a
    small JSON artifact (committed per round as VALIDATE_r{N}.json)."""
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas
    from rtvqa_tpu.kernels.motion_pallas import block_match_motion_pallas
    from rtvqa_tpu.kernels.vif_pallas import vif_features_pallas
    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache
    from rtvqa_tpu.ops.motion import block_match_motion, block_match_motion_pyramid
    from rtvqa_tpu.vmaf.adm import adm_features
    from rtvqa_tpu.vmaf.vif import vif_features

    enable_persistent_cache()
    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())  # first-fetch sync

    checks = []

    def check(name, got, want, tol):
        got = np.asarray(got, np.float64)
        want = np.asarray(want, np.float64)
        rel = float(np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-6)))
        checks.append({"name": name, "max_rel_err": rel, "tol": tol, "pass": rel <= tol})
        print(f"[validate] {name}: max_rel_err={rel:.3g} tol={tol}", flush=True)

    # 1440p exercises the 2048 < w < 3000 band (ADM strip-24 + f32 staging
    # fallback — ADVICE r3: previously untested on hardware); its w > 2048
    # rightly skips the fused-kernel section (production routes it to the
    # split composition, like 4K).
    for label, (h, w, b) in (("1080p", (1080, 1920, 4)),
                             ("1440p", (1440, 2560, 2)),
                             ("4k", (2160, 3840, 2))):
        rng = np.random.default_rng(7)
        ry = rng.integers(0, 256, (b, h, w), np.uint8)
        dy = np.clip(
            ry.astype(np.int16) + rng.integers(-6, 7, ry.shape, dtype=np.int16),
            0, 255,
        ).astype(np.uint8)
        ryf = jax.device_put(ry.astype(np.float32))
        dyf = jax.device_put(dy.astype(np.float32))
        ryq = jax.device_put(ry)
        dyq = jax.device_put(dy)

        # Exact mode: bit-for-algorithm equivalence with the XLA oracle.
        # The Pallas kernels get the PRODUCTION dtype (raw uint8, round 3i:
        # int8-bitcast DMA + in-VMEM value rebuild); the oracle runs f32.
        vx = {k: np.asarray(v) for k, v in vif_features(ryf, dyf).items()}
        vp = {
            k: np.asarray(v)
            for k, v in vif_features_pallas(ryq, dyq, fast3=False).items()
        }
        for k in vp:
            check(f"vif/{k}/{label}", vp[k], vx[k], 2e-5)
        # FAST3 (the TPU production default, scales <= 1): manual 3-pass
        # bf16 filter matmuls, documented feature-error budget ~5e-4
        # (docs/PARITY.md) — far inside the 0.1 VMAF score target.
        vf = {
            k: np.asarray(v)
            for k, v in vif_features_pallas(ryq, dyq, fast3=True).items()
        }
        for k in vf:
            check(f"vif_fast3/{k}/{label}", vf[k], vx[k], 5e-4)

        ap = {k: np.asarray(v) for k, v in adm_features_pallas(ryq, dyq).items()}
        ax = {k: np.asarray(v) for k, v in adm_features(ryf, dyf).items()}
        for k in ap:
            check(f"adm/{k}/{label}", ap[k], ax[k], 2e-5)
        mp = np.asarray(block_match_motion_pallas(ryq, dyq))
        mx = np.asarray(block_match_motion(ryq, dyq))
        check(f"motion/{label}", mp, mx, 1e-6)

        # Pyramid search (the round-3 production default for the complexity
        # suite): half-res Pallas kernel vs half-res XLA scan.
        mpp = np.asarray(block_match_motion_pyramid(ryq, dyq, impl="pallas"))
        mxp = np.asarray(block_match_motion_pyramid(ryq, dyq))
        check(f"motion_pyramid/{label}", mpp, mxp, 1e-6)

        # Strip-streamed uint8 gray kernel (round 3h) vs the XLA form —
        # identical expression, so only fma-contraction ULPs may differ.
        # Max abs error reduced ON DEVICE (a full-res f32 fetch at 4K is
        # ~66 MB of wire).
        from rtvqa_tpu.kernels.gray_pallas import yuv420_to_gray_pallas
        from rtvqa_tpu.ops.color import yuv420_to_gray

        uc = jax.device_put(rng.integers(0, 256, (b, h // 2, w // 2), np.uint8))
        vc = jax.device_put(rng.integers(0, 256, (b, h // 2, w // 2), np.uint8))
        gray_err = jax.jit(
            lambda yy, uu, vv: jnp.max(jnp.abs(
                yuv420_to_gray_pallas(yy, uu, vv) - yuv420_to_gray(yy, uu, vv)
            ))
        )
        err = float(np.asarray(gray_err(ryq, uc, vc))) / 255.0
        checks.append({"name": f"gray/{label}", "max_rel_err": err,
                       "tol": 1e-5, "pass": err <= 1e-5})
        print(f"[validate] gray/{label}: max_rel_err={err:.3g} tol=1e-05",
              flush=True)

        # Fused VIF0+PSNR+SSIM+motion kernel (round 3) vs the XLA programs.
        # Since round 5 this covers 1440p/4K too: the wide widths run under a
        # raised scoped-VMEM budget instead of routing to the split
        # composition (VERDICT r4 next #2/#6).
        from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas
        from rtvqa_tpu.metrics.quality import psnr_frames, ssim_frames
        from rtvqa_tpu.vmaf.filters import filter1d_sep
        from rtvqa_tpu.vmaf.motion import FILTER_5

        ru = rng.integers(0, 256, (b, h // 2, w // 2), np.uint8)
        du = np.clip(
            ru.astype(np.int16) + rng.integers(-6, 7, ru.shape, dtype=np.int16),
            0, 255,
        ).astype(np.uint8)
        pb = np.asarray(
            filter1d_sep(
                rng.integers(0, 256, (h, w)).astype(np.float32), FILTER_5
            )
        )
        # Exact mode (PSNR/SSIM/SAD are exact in EVERY mode; fast3 only
        # affects the VIF filter matmuls — checked at its budget below).
        fq = quality_fused_pallas(ryq, ru, ru, dyq, du, du, pb, fast3=False)
        p = psnr_frames(ry, ru, ru, dy, du, du)
        s = ssim_frames(ry, ru, ru, dy, du, du)
        check(f"fusedA/mse_y/{label}", np.asarray(fq["sse_y"]) / (h * w),
              np.asarray(p["mse_y"]), 1e-5)
        n_win_y = (h // 4 - 1) * (w // 4 - 1)
        n_win_c = (h // 8 - 1) * (w // 8 - 1)
        check(f"fusedA/ssim_y/{label}", np.asarray(fq["ssim_y_sum"]) / n_win_y,
              np.asarray(s["ssim_y"]), 1e-5)
        check(f"fusedA/ssim_u/{label}", np.asarray(fq["ssim_u_sum"]) / n_win_c,
              np.asarray(s["ssim_u"]), 1e-5)
        blurred = np.asarray(filter1d_sep(ry.astype(np.float32), FILTER_5))
        prevs = np.concatenate([pb[None], blurred[:-1]])
        sad_exp = np.abs(blurred - prevs).mean(axis=(-2, -1))
        check(f"fusedA/motion_sad/{label}",
              np.asarray(fq["sad_sum"]) / (h * w), sad_exp, 1e-4)
        check(f"fusedA/vif0/{label}", np.asarray(fq["vif_scale0"]),
              vx["vif_scale0"], 2e-5)
        fq3 = quality_fused_pallas(ryq, ru, ru, dyq, du, du, pb, fast3=True)
        check(f"fusedA/vif0_fast3/{label}", np.asarray(fq3["vif_scale0"]),
              vx["vif_scale0"], 5e-4)

        # VIF scales 1-3 tail kernel (round 4) on the fused kernel's
        # block-padded dec outputs — the production chunk composition.
        from rtvqa_tpu.kernels.vif_pallas import vif_tail_pallas

        fq_nc = quality_fused_pallas(
            ryq, ru, ru, dyq, du, du, pb, fast3=False, crop=False
        )
        hs, ws = (h + 1) // 2, (w + 1) // 2
        tail = vif_tail_pallas(
            fq_nc["dec_ref"], fq_nc["dec_dis"], fast3=False, h=hs, w=ws
        )
        for k in (1, 2, 3):
            check(f"vif_tail/scale{k}/{label}",
                  np.asarray(tail[f"vif_scale{k}"]),
                  vx[f"vif_scale{k}"], 2e-5)
        tail3 = vif_tail_pallas(
            fq_nc["dec_ref"], fq_nc["dec_dis"], fast3=True, h=hs, w=ws
        )
        for k in (1, 2, 3):
            check(f"vif_tail_fast3/scale{k}/{label}",
                  np.asarray(tail3[f"vif_scale{k}"]),
                  vx[f"vif_scale{k}"], 5e-4)

        # Raw-luma tail (round 4b): in-kernel scale-1 decimation from the
        # raw uint8 pair — the production chunk composition
        # (quality_fused_pallas(emit_dec=False) + vif_tail_pallas(raw=True)).
        # Production gates raw mode to w <= 2048 (untested at wide widths);
        # validate mirrors the gate.
        if w <= 2048:
            tail_raw = vif_tail_pallas(ryq, dyq, fast3=False, h=h, w=w,
                                       raw=True)
            for k in (1, 2, 3):
                check(f"vif_tail_raw/scale{k}/{label}",
                      np.asarray(tail_raw[f"vif_scale{k}"]),
                      vx[f"vif_scale{k}"], 2e-5)
            tail_raw3 = vif_tail_pallas(ryq, dyq, fast3=True, h=h, w=w,
                                        raw=True)
            for k in (1, 2, 3):
                check(f"vif_tail_raw_fast3/scale{k}/{label}",
                      np.asarray(tail_raw3[f"vif_scale{k}"]),
                      vx[f"vif_scale{k}"], 5e-4)

        # Sharded fused chunk body under shard_map ON DEVICE (round 5,
        # VERDICT r4 next #6): a 1-device mesh is what the single real chip
        # affords, and it still exercises Mosaic-under-shard_map — the class
        # of composition that breaks silently. Compared against the
        # unsharded production chunk program.
        if label == "1080p":
            from rtvqa_tpu.metrics.full_reference import _program_chunk
            from rtvqa_tpu.parallel.sharding import (
                make_mesh, sharded_quality_chunk_step,
            )

            mesh1 = make_mesh(n_clip=1, n_frame=1)
            step = sharded_quality_chunk_step(mesh1, impl="fused")
            ruq = jax.device_put(ru)
            duq = jax.device_put(du)
            pbq = jax.device_put(pb.astype(np.float32))
            sh_packed, sh_blur = step(
                ryq, ruq, ruq, dyq, duq, duq, pbq, np.bool_(True)
            )
            un_packed, un_blur = _program_chunk(
                ryq, ruq, ruq, dyq, duq, duq, pbq, True
            )
            check("sharded_fused/packed/1080p", np.asarray(sh_packed),
                  np.asarray(un_packed), 1e-6)
            check("sharded_fused/blur_carry/1080p",
                  np.asarray(sh_blur[-1]), np.asarray(un_blur), 1e-6)

    artifact = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "n_checks": len(checks),
        "all_pass": all(c["pass"] for c in checks),
        "checks": checks,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"validate": artifact["all_pass"], "n_checks": len(checks)}))
    return 0 if artifact["all_pass"] else 1


# ---------------------------------------------------------------------------
# Parent driver
# ---------------------------------------------------------------------------


def _stream_child(phase: str, deadline: float, phases: dict) -> int:
    """Run a bench child process, parsing PHASE_SECONDS lines as they appear;
    kill it (by pid, never by pattern) when the deadline passes."""
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--phase", phase],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    err_buf: list[str] = []
    t_err = threading.Thread(
        target=lambda: err_buf.extend(proc.stderr), daemon=True
    )
    t_err.start()

    def reader():
        for line in proc.stdout:
            line = line.strip()
            if line.startswith("[bench] "):
                sys.stderr.write(line + "\n")
                sys.stderr.flush()
            elif line.startswith("PHASE_SECONDS "):
                _, name, secs = line.split()
                phases[name] = float(secs)

    t_out = threading.Thread(target=reader, daemon=True)
    t_out.start()

    while proc.poll() is None:
        if time.monotonic() >= deadline:
            sys.stderr.write("[bench] budget exhausted — killing child\n")
            proc.kill()
            proc.wait()
            break
        time.sleep(0.5)
    t_out.join(timeout=5)
    t_err.join(timeout=5)
    if proc.returncode not in (0, None) and err_buf:
        sys.stderr.write(
            "[bench] child stderr tail:\n" + "".join(err_buf)[-2000:] + "\n"
        )
    return proc.returncode if proc.returncode is not None else -9


def _record_secondary(metric: str, value: float) -> None:
    """Persist a secondary metric (4K / e2e phases) so the next headline run
    can attach it to the driver-visible JSON line (VERDICT r3 next #8 — the
    4K and e2e numbers used to live only in BASELINE.md prose)."""
    try:
        os.makedirs(os.path.dirname(SECONDARY), exist_ok=True)
        try:
            with open(SECONDARY) as f:
                rec = json.load(f)
        except Exception:
            rec = {}
        rec[metric] = {"value": round(value, 3), "measured_at": time.time()}
        with open(SECONDARY, "w") as f:
            json.dump(rec, f)
    except Exception:
        pass


def _load_secondary() -> dict:
    """Secondary metrics with age stamps (hours) for the headline JSON."""
    try:
        with open(SECONDARY) as f:
            rec = json.load(f)
    except Exception:
        return {}
    out = {}
    for metric, entry in rec.items():
        out[metric] = {
            "value": entry["value"],
            "age_hours": round((time.time() - entry["measured_at"]) / 3600, 1),
        }
    return out


def _load_lastgood() -> dict:
    try:
        with open(LASTGOOD) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_lastgood(rec: dict) -> None:
    try:
        os.makedirs(os.path.dirname(LASTGOOD), exist_ok=True)
        with open(LASTGOOD, "w") as f:
            json.dump(rec, f)
    except Exception:
        pass


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--phase", choices=["all", "e2e", "4k", "1440p"], default=None
    )
    parser.add_argument(
        "--e2e", action="store_true",
        help="Report the decode-included end-to-end fps instead of the "
        "device-program headline.",
    )
    parser.add_argument(
        "--validate", nargs="?", const="VALIDATE.json", default=None,
        metavar="OUT_JSON",
        help="Run Pallas-vs-XLA on-device equivalence checks (1080p + 4K) "
        "and write the artifact JSON.",
    )
    args = parser.parse_args()

    if args.phase == "all":
        return phase_all()
    if args.phase == "e2e":
        phase_e2e()
        return 0
    if args.phase == "4k":
        return phase_4k()
    if args.phase == "1440p":
        return phase_1440p()
    if args.validate:
        return run_validate(args.validate)

    t0 = time.monotonic()
    deadline = t0 + BUDGET_S

    if args.e2e:
        phases: dict[str, float] = {}
        _stream_child("e2e", deadline, phases)
        spf = phases.get("e2e")
        if spf is None:
            print(json.dumps({"metric": "1080p_e2e_decode_included_frames_per_sec_per_chip",
                              "value": 0.0, "unit": "frames/sec/chip",
                              "vs_baseline": 0.0, "error": "e2e phase did not finish"}))
            return 1
        _record_secondary(
            "1080p_e2e_decode_included_frames_per_sec_per_chip", 1.0 / spf
        )
        print(json.dumps({
            "metric": "1080p_e2e_decode_included_frames_per_sec_per_chip",
            "value": round(1.0 / spf, 3),
            "unit": "frames/sec/chip",
            "vs_baseline": round((1.0 / spf) / (1.0 / cpu_baseline_secs()), 3),
        }))
        return 0

    # Headline: start the device child first, overlap the CPU baseline.
    phases: dict[str, float] = {}
    child = threading.Thread(
        target=_stream_child,
        args=("all", deadline - 15.0, phases),  # leave margin to emit JSON
        daemon=True,
    )
    child.start()
    cpu_spf = cpu_baseline_secs()
    child.join(timeout=max(1.0, deadline - time.monotonic()))

    # One retry if the child died early with budget to spare and phases
    # missing (remote worker crashes poison a process but not the machine).
    if ("complexity" not in phases or "quality" not in phases) and (
        deadline - time.monotonic() > 120.0
    ):
        sys.stderr.write("[bench] retrying missing phases in a fresh child\n")
        _stream_child("all", deadline - 10.0, phases)

    lastgood = _load_lastgood()
    measured = sorted(k for k in ("complexity", "quality") if k in phases)
    sources = {}
    vals = {}
    for k in ("complexity", "quality"):
        if k in phases:
            vals[k] = phases[k]
            sources[k] = "measured"
        elif k in lastgood:
            vals[k] = lastgood[k]
            sources[k] = "last_good"

    if len(vals) < 2:
        print(json.dumps({
            "metric": METRIC, "value": 0.0, "unit": "frames/sec/chip",
            "vs_baseline": 0.0, "partial": True,
            "error": f"phases measured: {measured or 'none'}; no last-good record",
        }))
        return 1

    if len(measured) == 2:
        _save_lastgood(
            {**{k: phases[k] for k in measured}, "_saved_at": time.time()}
        )

    total_dt = vals["complexity"] + vals["quality"]  # serialized, as in production
    device_fps = N_DEVICE / total_dt
    out = {
        "metric": METRIC,
        "value": round(device_fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(device_fps / (1.0 / cpu_spf), 3),
        # VERDICT r2 weak #6: the CPU baseline is a vectorized-NumPy proxy of
        # the hot kernels, lighter than the full reference pipeline.
        "vs_baseline_definition": "device fps / vectorized NumPy hot-kernel proxy fps (proxy omits ORB/Canny/color-entropy/VIF-ADM; ratio is an upper bound on proxy cost, lower bound on reference cost)",
    }
    if len(measured) < 2:
        out["partial"] = True
        out["phase_sources"] = sources
        if measured:
            # VERDICT r3 weak #6: a headline combining a freshly measured
            # phase with a last-good one mixes sessions whose device
            # throughput differs by up to ~25% — flag it loudly.
            out["cross_session_mix"] = True
            if "_saved_at" in lastgood:
                out["last_good_age_hours"] = round(
                    (time.time() - lastgood["_saved_at"]) / 3600, 1
                )
    # Roofline accounting (VERDICT r4 next #5): analytic per-frame
    # bytes/FLOPs vs v5e peaks, combined with the measured phase times —
    # makes "which unit bounds each phase" auditable from this artifact.
    try:
        from rtvqa_tpu.obs.roofline import (
            attach_measured, complexity_roofline, quality_roofline,
        )
        out["roofline"] = {
            "quality_1080p": attach_measured(
                quality_roofline(1080, 1920), vals["quality"] / N_DEVICE),
            "complexity_1080p": attach_measured(
                complexity_roofline(1080, 1920),
                vals["complexity"] / N_DEVICE),
            "bound_by": "VPU elementwise + per-cell Mosaic overhead + DMA "
            "(both phases run at single-digit % of the HBM roofline and "
            "<1% MFU; see rtvqa_tpu/obs/roofline.py and docs/DESIGN.md)",
        }
    except Exception:
        pass
    secondary = _load_secondary()
    if secondary:
        # 4K / e2e phase results from their own runs (bench.py --phase 4k /
        # --e2e), attached with age stamps so cross-session provenance is
        # explicit (VERDICT r3 next #8 + weak #6).
        out["secondary"] = secondary
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
