"""Unified streaming full-reference engine: PSNR + SSIM + VMAF features in
one pass.

The reference runs one ffmpeg subprocess evaluating psnr, ssim and libvmaf
filter chains over both videos in a single decode pass
(``video_processing.py:270-297``). This is the TPU-native equivalent: both
videos stream through the native decoder in lockstep batches (prefetched on a
background thread — host decode overlaps device compute) and per chunk the
engine computes every per-frame quantity from two building blocks:

* **program A** (cheap): PSNR plane MSEs (vf_psnr semantics), SSIM Y/U/V/All
  (x264 algorithm), and blurred-luma SADs for VMAF motion/motion2 (a carried
  blurred frame stitches chunk boundaries);
* **program B** (filter-heavy): VIF scales 0-3 + ADM2 — on TPU every scale
  of both runs as fused Pallas kernels (kernels.vif_pallas /
  kernels.adm_pallas).

On TPU the two are dispatched as ONE fused program per chunk
(``_program_chunk``): one dispatch + one packed fetch per chunk (every
fetched array costs a full RPC round trip through the tunnel), and a single
XLA executable schedules the phases sequentially — no concurrent residency
of two near-HBM-ceiling programs (which can crash the remote worker). On
CPU the split A/B dispatch is kept: there are no RPCs to save and the merged
module compiles several times slower on the single host core.

Per-frame scalars return to the host; pooling (mean MSE → PSNR, mean SSIM,
per-frame SVR → mean VMAF) happens at the end. Device memory stays bounded
by the chunk size regardless of clip length.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rtvqa_tpu.io.stream import VideoStream, prefetch, stage_to_device
from rtvqa_tpu.metrics.quality import psnr_frames, pooled_psnr, ssim_frames
from rtvqa_tpu.obs.logging import get_logger
from rtvqa_tpu.vmaf.adm import adm_features
from rtvqa_tpu.vmaf.filters import filter1d_sep
from rtvqa_tpu.vmaf.model import builtin_model, load_model
from rtvqa_tpu.vmaf.motion import FILTER_5
from rtvqa_tpu.vmaf.vif import vif_features

logger = get_logger("rtvqa_tpu.full_reference")

# Packed row orders (one device->host fetch per program call).
A_KEYS = (
    "mse_y", "mse_u", "mse_v", "mse_avg", "psnr_y", "psnr_avg",
    "ssim_y", "ssim_u", "ssim_v", "ssim_all", "motion_sad",
)
B_KEYS = ("vif_scale0", "vif_scale1", "vif_scale2", "vif_scale3", "adm2")
CHUNK_KEYS = A_KEYS + B_KEYS  # combined series key set


def resolve_precision(quality_precision: Optional[str]):
    """Map the config-level ``quality_precision`` string to the kernels'
    static ``fast3`` flag: None/"auto" -> None (backend policy,
    ``kernels.vif_pallas.resolve_fast3``), "exact" -> False, "fast" -> True.
    """
    if quality_precision in (None, "auto"):
        return None
    if quality_precision == "exact":
        return False
    if quality_precision == "fast":
        return True
    raise ValueError(
        f"quality_precision must be 'auto', 'exact' or 'fast', got "
        f"{quality_precision!r}"
    )


@jax.jit
def _program_a(ry, ru, rv, dy, du, dv, prev_blur, has_prev):
    """PSNR + SSIM + motion SADs for one lockstep chunk.

    prev_blur: (H, W) blurred last ref-luma of the previous chunk;
    has_prev: () bool — False for the first chunk (motion[0] = 0).
    Returns (packed (len(A_KEYS), N) float32, new blur carry — stays
    on-device across chunks).
    """
    out = {}
    out.update(psnr_frames(ry, ru, rv, dy, du, dv))
    out.update(ssim_frames(ry, ru, rv, dy, du, dv))
    blur = filter1d_sep(ry.astype(jnp.float32), FILTER_5)
    prev = jnp.concatenate([prev_blur[None], blur[:-1]], axis=0)
    sad = jnp.mean(jnp.abs(blur - prev), axis=(-2, -1))
    sad = sad.at[0].set(jnp.where(has_prev, sad[0], 0.0))
    out["motion_sad"] = sad
    packed = jnp.stack([out[k].astype(jnp.float32) for k in A_KEYS])
    return packed, blur[-1]


@functools.partial(jax.jit, static_argnames=("vif_egl", "adm_egl", "fast3"))
def _program_b(ry, dy, vif_egl=None, adm_egl=None, fast3=None):
    """VIF (4 scales) + ADM2 for one (sub-)chunk: (len(B_KEYS), N) packed.

    On TPU, VIF scale 0 (the dominant cost) runs as the fused Pallas kernel
    (kernels.vif_pallas) — one VMEM pass computing all five moment filters,
    the scale-0 statistics, and scale 1's decimated inputs; exact match with
    the XLA formulation.

    ``vif_egl``/``adm_egl`` are the NEG-mode enhancement-gain limits carried
    by neg model files (``feature_opts_dicts``); both Pallas kernels apply
    the gain cap natively, so NEG models stay on the fused TPU path (ADVICE
    r2 #1 — the XLA VIF fallback at full resolution exceeded the compile-time
    HBM budget at the Pallas-sized chunk).
    """
    out = {}
    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        # Raw uint8 luma goes straight into the Pallas kernels (round 3i:
        # they bitcast to int8 and rebuild values in VMEM — no full-res
        # astype(f32) HBM round trip).
        from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas
        from rtvqa_tpu.kernels.vif_pallas import vif_features_pallas

        out.update(
            vif_features_pallas(ry, dy, enhn_gain_limit=vif_egl, fast3=fast3)
        )
        out.update(adm_features_pallas(ry, dy, enhn_gain_limit=adm_egl))
    else:
        ryf = ry.astype(jnp.float32)
        dyf = dy.astype(jnp.float32)
        out.update(vif_features(ryf, dyf, enhn_gain_limit=vif_egl))
        out.update(adm_features(ryf, dyf, enhn_gain_limit=adm_egl))
    return jnp.stack([out[k].astype(jnp.float32) for k in B_KEYS])


def _to_psnr(mse):
    """vf_psnr per-frame PSNR (``inf`` for identical planes) — shared with
    metrics.quality.psnr_frames semantics."""
    finite = 10.0 * jnp.log10((255.0 * 255.0) / jnp.maximum(mse, 1e-30))
    return jnp.where(mse > 0.0, finite, jnp.inf)


# VIF scales 1-3 implementation inside the fused TPU chunk: "tail" (default;
# one per-frame kernel, round 4) or "chain" (the round-3 per-scale strip
# kernels) — env-switchable for on-device A/B.
_VIF_TAIL_MODE = os.environ.get("RTVQA_VIF_TAIL", "tail")


def _chunk_fused_tpu(ry, ru, rv, dy, du, dv, prev_blur, has_prev,
                     vif_egl, adm_egl, fast3=None, vif_tail=None,
                     adm_tail=None, interpret: bool = False):
    """TPU body of ``_program_chunk``: program A (PSNR/SSIM/motion) rides
    INSIDE the fused VIF scale-0 Pallas kernel (kernels.quality_pallas —
    round 3; program A as a standalone XLA program cost 0.10 s of the 0.37 s
    quality phase, VERDICT r2 next #2), VIF scales 1-3 run as ONE per-frame
    tail kernel on its decimated outputs (round 4), ADM runs as the fused
    Pallas kernels.

    ``interpret``: run the Pallas kernels in interpret mode — lets the
    multi-chip sharded body (``parallel.sharding.sharded_quality_chunk_step``
    with ``impl="fused"``) be CPU-tested under shard_map (round 5)."""
    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas
    from rtvqa_tpu.kernels.vif_pallas import vif_scale_pallas, vif_tail_pallas

    if ry.shape[-1] > 3840:
        # Beyond the validated 4K band: keep the round-2 composition (XLA
        # program A + fused Pallas VIF/ADM). Until round 5 this gate sat at
        # 2048 — the fused kernel's strip-16 config measured 17.0 MB of
        # scoped VMEM at 3840 lanes, over Mosaic's DEFAULT 16 MB budget;
        # raising the budget (the chip has 128 MB) unlocked 1440p/4K
        # (VERDICT r4 next #2).
        pa, blur = _program_a(ry, ru, rv, dy, du, dv, prev_blur, has_prev)
        pb = _program_b(ry, dy, vif_egl=vif_egl, adm_egl=adm_egl, fast3=fast3)
        return jnp.concatenate([pa, pb], axis=0), blur

    h, w = ry.shape[-2], ry.shape[-1]
    if vif_tail is None:
        vif_tail = _VIF_TAIL_MODE != "chain"
    # Raw tail mode (round 4b, RTVQA_VIF_TAIL=raw): the tail kernel derives
    # the scale-1 inputs itself from the raw uint8 luma, so the fused kernel
    # skips its dec stage (bisected at 13.7 ms) and the ~1 GB/chunk dec HBM
    # round trip. Measured NEUTRAL-to-slightly-negative on device (chunk
    # 140.1 vs 136.8 ms median at 128x1080p, scripts/probe_raw_tail_ab.py —
    # the per-chunk int8->f32 window rebuilds eat the saved stage), so the
    # dec-input tail stays the default; kept for wider-VMEM future parts.
    # Gated to w <= 2048 (untested at wide widths).
    raw_tail = (vif_tail and ry.dtype == jnp.uint8
                and _VIF_TAIL_MODE == "raw" and w <= 2048)
    fq = quality_fused_pallas(
        ry, ru, rv, dy, du, dv, prev_blur, egl=vif_egl, fast3=fast3,
        crop=False, emit_dec=not raw_tail, interpret=interpret,
    )
    h2, w2 = ru.shape[-2], ru.shape[-1]
    n_y = h * w
    n_c = h2 * w2

    out = {}
    out["mse_y"] = fq["sse_y"] / n_y
    out["mse_u"] = fq["sse_u"] / n_c
    out["mse_v"] = fq["sse_v"] / n_c
    out["mse_avg"] = (fq["sse_y"] + fq["sse_u"] + fq["sse_v"]) / (n_y + 2 * n_c)
    out["psnr_y"] = _to_psnr(out["mse_y"])
    out["psnr_avg"] = _to_psnr(out["mse_avg"])

    n_win_y = (h // 4 - 1) * (w // 4 - 1)
    n_win_c = (h2 // 4 - 1) * (w2 // 4 - 1)
    out["ssim_y"] = fq["ssim_y_sum"] / n_win_y
    out["ssim_u"] = fq["ssim_u_sum"] / n_win_c
    out["ssim_v"] = fq["ssim_v_sum"] / n_win_c
    out["ssim_all"] = (
        out["ssim_y"] * n_y + out["ssim_u"] * n_c + out["ssim_v"] * n_c
    ) / (n_y + 2 * n_c)

    sad = fq["sad_sum"] / n_y
    out["motion_sad"] = sad.at[0].set(jnp.where(has_prev, sad[0], 0.0))

    out["vif_scale0"] = fq["vif_scale0"]
    hs, ws = (h + 1) // 2, (w + 1) // 2
    if raw_tail:
        # Round 4 (VERDICT r3 next #1): scales 1-3 as ONE per-frame kernel
        # — 128 grid cells instead of ~1900 strip cells across three
        # kernels, no scale-2/3 input HBM round trips, and (4b) the scale-1
        # decimation derived in-kernel from the raw luma.
        # RTVQA_VIF_TAIL=chain restores the per-scale chain.
        out.update(vif_tail_pallas(
            ry, dy, egl=vif_egl, fast3=fast3, h=h, w=w, raw=True,
            interpret=interpret,
        ))
    elif vif_tail:
        out.update(vif_tail_pallas(
            fq["dec_ref"], fq["dec_dis"], egl=vif_egl, fast3=fast3,
            h=hs, w=ws, interpret=interpret,
        ))
    else:
        # Chain the VIF scales on the kernels' block-padded dec outputs
        # (valid dims as statics) — no crop copies between scales (round 3e).
        ref, dis = fq["dec_ref"], fq["dec_dis"]
        for scale in (1, 2, 3):
            v, ref, dis = vif_scale_pallas(
                ref, dis, scale, egl=vif_egl, fast3=fast3, h=hs, w=ws,
                crop=False, interpret=interpret,
            )
            hs, ws = (hs + 1) // 2, (ws + 1) // 2
            out[f"vif_scale{scale}"] = v

    # Raw uint8 luma (round 3i): the kernel bitcasts to int8 and rebuilds
    # values in VMEM — no full-res astype(f32) HBM round trip.
    out.update(adm_features_pallas(ry, dy, enhn_gain_limit=adm_egl,
                                   tail=adm_tail))
    packed = jnp.stack([out[k].astype(jnp.float32) for k in CHUNK_KEYS])
    return packed, fq["blur_carry"]


def _program_chunk_body(ry, ru, rv, dy, du, dv, prev_blur, has_prev,
                        vif_egl=None, adm_egl=None, fast3=None):
    """One fused program per chunk: PSNR+SSIM+motion AND VIF+ADM.

    Merging everything into a single XLA program saves one dispatch + one
    fetch round trip per chunk (~26 ms/chunk measured through the tunnel at
    64 1080p frames) and removes the concurrent-big-program worker-crash
    hazard by construction — XLA schedules the phases inside one executable.
    On TPU the A-side metrics are computed INSIDE the fused VIF scale-0
    Pallas kernel (``_chunk_fused_tpu``); on CPU the XLA programs A+B are
    composed. Returns (packed (len(CHUNK_KEYS), N), new blur carry).
    """
    if jax.default_backend() != "cpu":
        return _chunk_fused_tpu(
            ry, ru, rv, dy, du, dv, prev_blur, has_prev, vif_egl, adm_egl,
            fast3,
        )
    pa, blur = _program_a(ry, ru, rv, dy, du, dv, prev_blur, has_prev)
    pb = _program_b(ry, dy, vif_egl=vif_egl, adm_egl=adm_egl)
    return jnp.concatenate([pa, pb], axis=0), blur


_program_chunk = functools.partial(
    jax.jit, static_argnames=("vif_egl", "adm_egl", "fast3")
)(_program_chunk_body)


@functools.partial(
    jax.jit,
    static_argnames=("vif_egl", "adm_egl", "fast3", "resize_h", "resize_w",
                     "block", "radius", "motion_search", "motion_impl",
                     "complexity_on"),
)
def _program_chunk_combined(
    ry, ru, rv, dy, du, dv, prev_blur, has_prev, tail_y, tail_u, tail_v,
    vif_egl=None, adm_egl=None, fast3=None, *,
    resize_h, resize_w, block=16, radius=8, motion_search="pyramid",
    motion_impl="xla", complexity_on="dis",
):
    """Full-suite chunk program: quality AND per-frame complexity values in
    ONE dispatched XLA program — one fetch round trip per chunk.

    The production path for the full-suite-per-frame workload
    (``analyze_combined`` at ``frame_interval=1``): today that loop dispatches
    the quality chunk program plus a separate complexity-chunk program per
    chunk through the ``ComplexityAccumulator`` tap; through the tunnel each
    program call carries ~40 ms of fixed dispatch+fetch cost, so merging the
    two saves one round trip per chunk (the reference pays this workload as
    one ffmpeg pass PLUS three cv2 passes — ``video_processing.py:216,233``,
    ``complexity_metrics.py:262,296,520``).

    ``tail_*``: the carried previous sampled frame of the complexity target
    stream (zeros for the first chunk — its slot-0 values are dropped by the
    EWM re-indexing in ``ComplexityAccumulator.finalize``). Returns
    ``(packed (len(CHUNK_KEYS)+7, N), blur_carry, tail_y', tail_u',
    tail_v')`` — carries stay on device across chunks.
    """
    from rtvqa_tpu.metrics.complexity_streaming import _chunk_values_body

    packed_q, blur = _program_chunk_body(
        ry, ru, rv, dy, du, dv, prev_blur, has_prev, vif_egl, adm_egl, fast3
    )
    cy, cu, cv = (dy, du, dv) if complexity_on == "dis" else (ry, ru, rv)
    packed_c = _chunk_values_body(
        cy, cu, cv, tail_y, tail_u, tail_v,
        resize_h=resize_h, resize_w=resize_w, block=block, radius=radius,
        motion_search=motion_search, motion_impl=motion_impl,
    )
    packed = jnp.concatenate([packed_q, packed_c], axis=0)
    # Padded tails repeat the last valid frame, so [-1] IS the last valid one.
    return packed, blur, cy[-1], cu[-1], cv[-1]


def auto_chunk(width: int, height: int, requested: Optional[int] = None) -> int:
    """Frames per stream chunk (one fused program call), scaled to resolution.

    With the fused Pallas VIF and ADM kernels (round 2), the quality
    program's HBM peak dropped enough that the merged chunk program compiles
    at 128 simultaneous 1080p frames; 64 balances that against host decode
    latency and RAM. Larger chunks amortize the tunnel's ~40 ms fixed cost
    per program call.
    """
    budget = max(2, int(64 * (1080 * 1920) / max(width * height, 1)))
    budget = min(budget, 128)
    chunk = min(requested or budget, budget)
    return max(2, (chunk // 2) * 2)


def _run_quality_chunks(
    ref_path: str,
    dis_path: str,
    chunk: int,
    vif_egl,
    adm_egl,
    tap=None,
    runner=None,
    stage: bool = True,
    fast3=None,
    combined=None,
) -> tuple[dict, int]:
    """The shared streaming loop: decode both streams once in lockstep,
    stage full chunks into HBM from the prefetch threads (explicit
    ``device_put`` — jit's implicit numpy upload is ~30x slower through the
    tunnel and re-uploads shared operands per program), run ONE fused metric
    program per chunk, return (per-frame series, n_frames).

    ``tap(db_host_batch, n, global_offset)`` — optional callback fired per
    chunk with the decoded host batches (the combined engine's complexity
    sampling hook).

    ``runner(ry..dv, prev_blur, has_prev) -> (packed, blur_carry)`` —
    optional chunk program override (the multi-chip sharded step,
    ``pipeline.quality_sharded``); ``stage=False`` skips single-device HBM
    staging for runners that place data themselves (a shard_map'd jit
    re-shards its inputs across the mesh).

    ``combined`` — optional ``ComplexityAccumulator``-driven merged mode
    (``{"acc": ComplexityAccumulator, "complexity_on": "dis"|"ref"}``): every
    frame also runs the complexity value program INSIDE the quality chunk
    program (``_program_chunk_combined``, one dispatch + one fetch per chunk);
    per-frame values land in the accumulator via ``add_packed``. The
    ``frame_interval=1`` fast path of ``analyze_combined``.

    Measured (v5e, 128 x 1080p, scripts/probe_merged_chunk.py): the merged
    program compiles fine and runs 415.7 ms vs 240.4 + 179.7 = 420.1 ms for
    the separate programs — device-side the win is ~1% (the tunnel's
    per-call fixed cost mostly overlaps execution). The structural win is on
    the WIRE: the tap path re-uploads every sampled frame through the
    accumulator (~3.1 MB/frame at the 13-35 MB/s wire rate) and pays a second
    program family's dispatches; merged reuses the staged quality planes and
    fetches ONE packed array. Mutually exclusive
    with ``tap``/``runner``.
    """
    stage_chunk = chunk if stage else None
    ref_it = prefetch(
        stage_to_device(VideoStream(ref_path, 1, chunk), stage_chunk), depth=1
    )
    dis_it = prefetch(
        stage_to_device(VideoStream(dis_path, 1, chunk), stage_chunk), depth=1
    )

    try:
        return _quality_chunk_loop(
            ref_it, dis_it, chunk, vif_egl, adm_egl, tap, runner, fast3,
            combined,
        )
    finally:
        # Close on ANY exit (ADVICE r2 #2): an exception mid-chunk must not
        # leave the prefetch producer threads and decoder contexts alive
        # until GC finalizes the generators.
        ref_it.close()
        dis_it.close()


def _quality_chunk_loop(ref_it, dis_it, chunk, vif_egl, adm_egl, tap,
                        runner=None, fast3=None, combined=None):
    series: dict[str, list[np.ndarray]] = {}
    carry_blur = None
    first = True
    n_frames = 0
    tails = None  # merged mode: carried complexity tail frames (on device)

    # Depth-1 fetch pipeline (round 4): chunk k's packed outputs are
    # materialized only after chunk k+1's program is DISPATCHED, so the
    # ~30-40 ms small-fetch RPC overlaps the in-flight execution instead of
    # serializing with it (scripts/probe_pipeline_fetch.py: quality chunk
    # 137.8 -> 115.5 ms, complexity 77.3 -> 53.9 ms per 128x1080p rep).
    # The device carries (blur, tails) feed the next dispatch WITHOUT
    # materialization, so only the packed fetch is deferred. Depth 1 keeps
    # at most two programs in flight and is a HARD cap (ADVICE r4 #3):
    # deeper concurrent dispatch has crashed the tunnel worker (CLAUDE.md),
    # and unlike bench.py this streaming loop has no fresh-subprocess retry
    # — a poisoned worker here loses the whole analysis, not one rep.
    pending = None  # (packed_dev_or_host, n, timestamps_or_None)

    def flush(acc=None):
        # A double flush is a no-op by construction (ADVICE r4 #1): pending
        # is consumed here, not at the call sites.
        nonlocal n_frames, pending
        if pending is None:
            return
        packed_h, pn, ts = pending
        pending = None
        packed_h = np.asarray(packed_h)
        if acc is not None:
            acc.add_packed(packed_h[len(CHUNK_KEYS):, :pn], ts)
            packed_h = packed_h[: len(CHUNK_KEYS)]
        for row, k in enumerate(CHUNK_KEYS):
            series.setdefault(k, []).append(packed_h[row, :pn])
        n_frames += pn

    while True:
        rb = next(ref_it, None)
        db = next(dis_it, None)
        if rb is None or db is None:
            break
        rhost, dhost = rb.host, db.host
        n = min(rhost.y.shape[0], dhost.y.shape[0])
        if n == 0:
            break
        pad = chunk - n

        if pad == 0 and rb.y is not None and db.y is not None:
            # Full lockstep chunk: planes already staged in HBM.
            ry, ru, rv = rb.y, rb.u, rb.v
            dy, du, dv = db.y, db.u, db.v
        else:
            def prep(a, n=n, pad=pad):
                a = a[:n]
                return np.concatenate([a, np.repeat(a[-1:], pad, 0)], 0)

            ry, ru, rv = prep(rhost.y), prep(rhost.u), prep(rhost.v)
            dy, du, dv = prep(dhost.y), prep(dhost.u), prep(dhost.v)

        if carry_blur is None:
            carry_blur = np.zeros(rhost.y.shape[1:], np.float32)
        if combined is not None:
            acc = combined["acc"]
            on_dis = combined.get("complexity_on", "dis") == "dis"
            if tails is None:
                tails = (
                    np.zeros(rhost.y.shape[1:], rhost.y.dtype),
                    np.zeros(rhost.u.shape[1:], rhost.u.dtype),
                    np.zeros(rhost.v.shape[1:], rhost.v.dtype),
                )
            packed, carry_blur, *tails = _program_chunk_combined(
                ry, ru, rv, dy, du, dv, carry_blur, jnp.asarray(not first),
                *tails, vif_egl=vif_egl, adm_egl=adm_egl, fast3=fast3,
                resize_h=acc.resize_height, resize_w=acc.resize_width,
                block=acc.block, radius=acc.radius,
                motion_search=acc.motion_search, motion_impl=acc.motion_impl,
                complexity_on="dis" if on_dis else "ref",
            )
            chost = dhost if on_dis else rhost
            flush(acc)  # chunk k-1's ONE fetch, after chunk k's dispatch
            pending = (packed, n, chost.timestamps_ms[:n])
        elif runner is not None:
            packed, carry_blur = runner(
                ry, ru, rv, dy, du, dv, carry_blur, jnp.asarray(not first)
            )
            flush()
            pending = (packed, n, None)
        elif jax.default_backend() != "cpu":
            # One fused program per chunk: one dispatch + one (deferred)
            # fetch round trip through the tunnel.
            packed, carry_blur = _program_chunk(
                ry, ru, rv, dy, du, dv, carry_blur, jnp.asarray(not first),
                vif_egl=vif_egl, adm_egl=adm_egl, fast3=fast3,
            )
            flush()
            pending = (packed, n, None)
        else:
            # CPU: no RPC round trips to save, and the merged module takes
            # several times longer to compile on the single host core than
            # the two halves — keep the split dispatch, no deferral.
            pa, carry_blur = _program_a(
                ry, ru, rv, dy, du, dv, carry_blur, jnp.asarray(not first)
            )
            pa = np.asarray(pa)
            pb = np.asarray(_program_b(ry, dy, vif_egl=vif_egl, adm_egl=adm_egl))
            flush()
            pending = (np.concatenate([pa, pb], axis=0), n, None)

        if tap is not None:
            # n_frames counts flushed chunks 0..k-1 — this chunk's offset.
            tap(rhost, dhost, n, n_frames)

        first = False
        if rhost.y.shape[0] != dhost.y.shape[0]:
            break  # one stream ended mid-batch: stop at the common prefix

    flush(combined["acc"] if combined is not None and pending is not None
          else None)
    return {k: np.concatenate(v) for k, v in series.items()}, n_frames


def analyze_full_reference(
    ref_path: str,
    dis_path: str,
    chunk: Optional[int] = None,
    vmaf_model_path: Optional[str] = None,
    quality_precision: Optional[str] = None,
) -> dict:
    """Stream both videos once; return pooled PSNR/SSIM/VMAF + per-frame series.

    ``quality_precision``: None/"auto" = FAST3 filter matmuls on TPU, exact
    on CPU (``kernels.vif_pallas.resolve_fast3``); "exact"/"fast" force.
    """
    probe = VideoStream(ref_path, 1, 1)
    chunk = auto_chunk(probe.info.width, probe.info.height, chunk)
    probe.close()
    # Load the model up-front: NEG variants carry extractor options
    # (enhancement-gain limits) that change the feature programs themselves.
    model = load_model(vmaf_model_path) if vmaf_model_path else None
    s, n_frames = _run_quality_chunks(
        ref_path, dis_path, chunk,
        model.vif_enhn_gain_limit if model else None,
        model.adm_enhn_gain_limit if model else None,
        fast3=resolve_precision(quality_precision),
    )
    if n_frames == 0:
        return {"n_frames": 0}
    return pool_full_reference(s, n_frames, vmaf_model_path, model=model)


def analyze_combined(
    ref_path: str,
    dis_path: str,
    *,
    frame_interval: int = 10,
    resize_width: int = 64,
    resize_height: int = 64,
    smoothing_factor: float = 0.8,
    complexity_chunk: int = 32,
    complexity_on: str = "dis",
    chunk: Optional[int] = None,
    vmaf_model_path: Optional[str] = None,
    quality_precision: Optional[str] = None,
    motion_search: str = "pyramid",
    merged: Optional[bool] = None,
) -> tuple[dict, "object"]:
    """One decode pass per stream: full-reference quality AND the eight-metric
    complexity suite from the same lockstep loop.

    The reference decodes the encoded clip once for ffmpeg's quality filters
    and three more times for complexity (``video_processing.py:216+233``,
    ``complexity_metrics.py:262,520,296`` — SURVEY.md §2.4(3)). The separate
    engines here already cut that to one full pass per stream plus one sampled
    pass; this combined engine reaches the two-pass minimum by tapping every
    ``frame_interval``-th frame of the complexity target stream
    (``complexity_on``: 'dis' = encoded clip, the reference default; 'ref' =
    the analyze_original mode) out of the quality loop and feeding a
    ``ComplexityAccumulator`` (identical chunking/pooling to the streaming
    driver — equivalence tested).

    ``merged``: run complexity INSIDE the quality chunk program
    (``_program_chunk_combined`` — one dispatch + one fetch per chunk instead
    of two program families). Only applicable at ``frame_interval=1`` (every
    frame feeds both); ``None`` = auto (on whenever applicable on TPU, where
    each saved program call is a ~40 ms tunnel round trip; off on CPU, where
    there is nothing to save and the merged module compiles slower).

    Returns ``(quality_dict, ComplexityResult)``.
    """
    from rtvqa_tpu.metrics.complexity_streaming import ComplexityAccumulator

    if merged is None:
        merged = frame_interval == 1 and jax.default_backend() != "cpu"
    if merged and frame_interval != 1:
        raise ValueError(
            "merged=True requires frame_interval=1 (every frame feeds the "
            f"combined chunk program); got frame_interval={frame_interval}"
        )

    probe = VideoStream(ref_path, 1, 1)
    chunk = auto_chunk(probe.info.width, probe.info.height, chunk)
    probe.close()
    model = load_model(vmaf_model_path) if vmaf_model_path else None

    acc = ComplexityAccumulator(
        resize_width, resize_height, smoothing_factor, complexity_chunk,
        motion_search=motion_search,
    )

    def tap(rhost, dhost, n, offset):
        # Sampled frames for complexity out of this already-decoded chunk
        # (1-based sampling: global frames k-1, 2k-1, … — decode_sampled
        # semantics, SURVEY.md §2.4(4) unified).
        cb = dhost if complexity_on == "dis" else rhost
        gidx = np.arange(offset, offset + n)
        keep = (gidx + 1) % frame_interval == 0
        if keep.any():
            acc.add(
                cb.y[:n][keep], cb.u[:n][keep], cb.v[:n][keep],
                cb.timestamps_ms[:n][keep],
            )

    s, n_frames = _run_quality_chunks(
        ref_path, dis_path, chunk,
        model.vif_enhn_gain_limit if model else None,
        model.adm_enhn_gain_limit if model else None,
        tap=None if merged else tap,
        fast3=resolve_precision(quality_precision),
        combined={"acc": acc, "complexity_on": complexity_on} if merged else None,
    )
    comp = acc.finalize()
    if n_frames == 0:
        return {"n_frames": 0}, comp
    return pool_full_reference(s, n_frames, vmaf_model_path, model=model), comp


def pool_full_reference(
    s: dict[str, np.ndarray],
    n_frames: int,
    vmaf_model_path: Optional[str] = None,
    model=None,
) -> dict:
    """Pool per-frame series (keys ``CHUNK_KEYS``, each (n_frames,)) into the
    final metrics dict. Shared by the streaming single-device engine above and
    the sharded multi-chip step (``pipeline.quality_sharded``) so both paths
    pool identically (PSNR mean-MSE pooling, motion2 min rule, SVR predict).
    """
    valid = np.ones(n_frames, bool)
    psnr = float(np.asarray(pooled_psnr(jnp.asarray(s["mse_avg"]), jnp.asarray(valid))))
    ssim = float(np.mean(s["ssim_all"]))

    # motion2[t] = min(sad[t], sad[t+1]); last frame keeps its backward SAD.
    sad = s["motion_sad"]
    fwd = np.concatenate([sad[1:], [np.inf]])
    motion2 = np.minimum(sad, fwd)
    motion2[0] = 0.0

    feats = {
        "adm2": s["adm2"],
        "motion2": motion2.astype(np.float32),
        "vif_scale0": s["vif_scale0"],
        "vif_scale1": s["vif_scale1"],
        "vif_scale2": s["vif_scale2"],
        "vif_scale3": s["vif_scale3"],
    }
    vmaf_is_fallback = model is None and not vmaf_model_path
    if model is None and vmaf_model_path:
        model = load_model(vmaf_model_path)
    if model is None:
        model = builtin_model()
        logger.warning(
            "No VMAF model file given; using %s — scores are qualitative, not "
            "libvmaf-parity. Provide vmaf_v0.6.1.json via vmaf_model_path.",
            model.name,
        )
    vmaf_per_frame = np.asarray(model.predict(feats))

    return {
        "n_frames": n_frames,
        "psnr": psnr,
        "ssim": ssim,
        "vmaf": float(vmaf_per_frame.mean()),
        "per_frame": {
            "psnr": s["psnr_avg"],
            "ssim": s["ssim_all"],
            "vmaf": vmaf_per_frame,
            **feats,
        },
        "vmaf_model": model.name,
        # True when the score came from the invented builtin fallback rather
        # than a real libvmaf model file — consumers must not present it as a
        # libvmaf-parity VMAF (the CSV sink leaves the cell empty by default).
        "vmaf_is_fallback": vmaf_is_fallback,
    }
