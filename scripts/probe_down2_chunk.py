"""One-session probe (round 3b): down2 variants + 256-frame chunk scaling.

Hypotheses (CLAUDE.md perf state):
1. ``down2_mean``'s lane-splitting reshape costs ~29 ms at 128x1080p — far
   above the ~1.6 ms HBM floor. Candidate replacements must be BITWISE equal
   (the pyramid motion argmin breaks ties by value): reduce_window, sublane
   strided-add + lane pooling matmul (HIGHEST — 0.25 two-hot, exact in f32),
   full two-sided pooling matmuls.
2. The ~40 ms fixed per-program-call cost is ~10% of the 0.40 s headline at
   128-frame chunks; 256-frame chunks would halve it IF the fused programs
   still compile inside the worker's HBM budget.

All measurements in ONE process (variable first-fetch stall), inputs
synthesized on-device, reps de-memoized via a tag scalar that rounds away
(g + tag*1e-30 == g bitwise for gray-scale magnitudes). Pooling matrices are
passed as ARGUMENTS, never jit-closure constants (HTTP 413, CLAUDE.md). Each
experiment is try/except-isolated; the risky 256-frame compiles run LAST.
"""

from __future__ import annotations

import time
import traceback

import numpy as np

H, W = 1080, 1920
N = 128
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    t0 = time.perf_counter()

    def note(msg):
        print(f"[probe] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench

    gen, distort = bench.device_frame_fns(N, H, W)
    y, u, v = gen(0)
    np.asarray(y[0, 0, :8])
    note("128-frame inputs synthesized on-device")

    from rtvqa_tpu.ops.color import yuv420_to_gray
    from rtvqa_tpu.ops.motion import down2_mean

    gray = jax.jit(yuv420_to_gray)(y, u, v)
    jax.block_until_ready(gray)

    tags = [jnp.float32(k) for k in range(REPS + 1)]

    def timeit(name, fn, variants=tags, reps=REPS):
        try:
            fn(variants[-1])  # warmup/compile
            t1 = time.perf_counter()
            for k in range(reps):
                fn(variants[k])
            dt = (time.perf_counter() - t1) / reps
            print(f"[probe] {name}: {dt * 1000:.1f} ms", flush=True)
            return dt
        except Exception:
            print(f"[probe] {name}: FAILED", flush=True)
            traceback.print_exc()
            return None

    # --- down2 variants ------------------------------------------------------
    # Pooling matrices staged as device arrays, passed as jit ARGUMENTS.
    S_lane = np.zeros((W, W // 2), np.float32)
    S_lane[2 * np.arange(W // 2), np.arange(W // 2)] = 0.25
    S_lane[2 * np.arange(W // 2) + 1, np.arange(W // 2)] = 0.25
    S_dev = jax.device_put(S_lane)
    P_row = np.zeros((H // 2, H), np.float32)
    P_row[np.arange(H // 2), 2 * np.arange(H // 2)] = 1.0
    P_row[np.arange(H // 2), 2 * np.arange(H // 2) + 1] = 1.0
    P_dev = jax.device_put(P_row)
    jax.block_until_ready((S_dev, P_dev))

    HI = jax.lax.Precision.HIGHEST

    def v_current(x, S, P):
        return down2_mean(x)

    def v_reduce_window(x, S, P):
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID"
        )
        return 0.25 * s

    def v_sublane_add_lane_mm(x, S, P):
        xh = x[:, 0::2, :] + x[:, 1::2, :]          # sublane stride-2
        return jnp.einsum("nhw,wc->nhc", xh, S, precision=HI)

    def v_sublane_reshape_lane_mm(x, S, P):
        xh = x.reshape(x.shape[0], H // 2, 2, W).sum(2)
        return jnp.einsum("nhw,wc->nhc", xh, S, precision=HI)

    def v_both_mm(x, S, P):
        xh = jnp.einsum("rh,nhw->nrw", P, x, precision=HI)
        return jnp.einsum("nrw,wc->nrc", xh, S, precision=HI)

    variants = {
        "reshape_reduce(current)": v_current,
        "reduce_window": v_reduce_window,
        "sublane_add+lane_mm": v_sublane_add_lane_mm,
        "sublane_reshape+lane_mm": v_sublane_reshape_lane_mm,
        "both_mm": v_both_mm,
    }

    # Exactness first (bitwise vs current — argmin tie-breaking needs it).
    try:
        base = jax.jit(down2_mean)(gray)
        jax.block_until_ready(base)

        @jax.jit
        def diff(g, b, S, P):
            outs = [f(g, S, P) for f in variants.values()]
            return jnp.stack([jnp.max(jnp.abs(o - b)) for o in outs])

        d = np.asarray(diff(gray, base, S_dev, P_dev))
        for i, name in enumerate(variants):
            print(f"[probe] exactness {name}: max_abs_diff={float(d[i]):.3g}",
                  flush=True)
    except Exception:
        traceback.print_exc()

    # In-situ timing: variant feeding the Pallas coarse search (forces HBM
    # materialization of the pooled array — a bare sum would let XLA elide
    # the pooling layout entirely).
    from rtvqa_tpu.kernels.motion_pallas import block_match_motion_pallas

    for name, fn in variants.items():
        @jax.jit
        def pooled_search(g, tag, S, P, f=fn):
            gh = f(g + tag * 1e-30, S, P)
            return jnp.sum(
                block_match_motion_pallas(gh[:-1], gh[1:], block=8, radius=4)
            )

        timeit(f"down2[{name}]+search",
               lambda k, jf=pooled_search: np.asarray(jf(gray, k, S_dev, P_dev)))

    # Search-only floor (pre-pooled input).
    gh0 = jax.jit(down2_mean)(gray)
    jax.block_until_ready(gh0)

    @jax.jit
    def search_only(gh, tag):
        gh = gh + tag * 1e-30
        return jnp.sum(
            block_match_motion_pallas(gh[:-1], gh[1:], block=8, radius=4)
        )

    timeit("search_only(prepooled)", lambda k: np.asarray(search_only(gh0, k)))

    # --- 256-frame chunk scaling (risky compiles LAST) -----------------------
    from rtvqa_tpu.metrics.complexity import complexity_suite_packed
    from rtvqa_tpu.metrics.full_reference import _program_chunk

    # Baseline at 128 for in-session comparison.
    n128 = np.int32(N)
    ts128 = [
        jax.device_put((np.arange(N) * 33.3 + rep).astype(np.float32))
        for rep in range(REPS + 1)
    ]
    dt_c128 = timeit(
        "complexity@128",
        lambda k: np.asarray(complexity_suite_packed(
            y, u, v, k, n128, resize_h=64, resize_w=64, motion_impl="pallas"
        )),
        ts128,
    )

    dy = distort(y, 1)
    jax.block_until_ready(dy)
    fill = jax.jit(lambda c: jnp.full((H, W), c, jnp.float32))
    blurs = [fill(np.float32(1e-3 * (rep + 1))) for rep in range(REPS + 1)]

    def run_q(blur, args):
        packed, _ = _program_chunk(*args, blur, True)
        np.asarray(packed)

    args128 = (y, u, v, dy, u, v)
    dt_q128 = timeit("quality@128", lambda b: run_q(b, args128), blurs)

    try:
        gen256, distort256 = bench.device_frame_fns(256, H, W)
        y2, u2, v2 = gen256(0)
        dy2 = distort256(y2, 1)
        np.asarray(dy2[0, 0, :8])
        note("256-frame inputs staged")
    except Exception:
        traceback.print_exc()
        return 0

    n256 = np.int32(256)
    ts256 = [
        jax.device_put((np.arange(256) * 33.3 + rep).astype(np.float32))
        for rep in range(REPS + 1)
    ]
    dt_c256 = timeit(
        "complexity@256",
        lambda k: np.asarray(complexity_suite_packed(
            y2, u2, v2, k, n256, resize_h=64, resize_w=64, motion_impl="pallas"
        )),
        ts256,
    )
    if dt_c128 and dt_c256:
        print(f"[probe] complexity ms/frame: 128={dt_c128/128*1000:.2f} "
              f"256={dt_c256/256*1000:.2f}", flush=True)

    args256 = (y2, u2, v2, dy2, u2, v2)
    dt_q256 = timeit("quality@256", lambda b: run_q(b, args256), blurs)
    if dt_q128 and dt_q256:
        print(f"[probe] quality ms/frame: 128={dt_q128/128*1000:.2f} "
              f"256={dt_q256/256*1000:.2f}", flush=True)
    if all((dt_c128, dt_q128, dt_c256, dt_q256)):
        f128 = 128 / (dt_c128 + dt_q128)
        f256 = 256 / (dt_c256 + dt_q256)
        print(f"[probe] headline-equivalent: 128-chunk {f128:.1f} f/s, "
              f"256-chunk {f256:.1f} f/s", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
