"""Round-5 probe: attribute the motion pyramid's ~12 ms of unexplained
pad/overhead (VERDICT r4 next #3) and A/B the fused-pad prep.

CLAUDE.md round-4 bisection: pyramid ~39 ms = down2 ~7 + half-res search
kernel ~20 + "pads/overheads" ~12. The old prep ran FOUR full-array HBM pad
copies between down2 and the kernel (prev halo pad -> band dynamic-slice ->
lane-alignment pad -> 2x ragged-grid row pads); round 5 fuses each operand's
pads into ONE jnp.pad (kernels/motion_pallas.py single-band path). This
probe measures, in ONE session (A/B rule):

  floor      — tiny-fetch RPC floor (subtract from everything)
  down2      — the 2x2 mean pool alone (sum-reduced fetch)
  pyr/old    — down2 + OLD sequential pads + kernel   (prep inlined below)
  pyr/new    — down2 + fused single-pad prep + kernel (library path)
  suite/old  — full complexity_suite, motion via old prep (fresh jit)
  suite/new  — full complexity_suite, motion via library path (fresh jit)
  eq/*       — bitwise equality old vs new (pyramid series + packed suite)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_pyramid_stages.py
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

N, H, W = 128, 1080, 1920
REPS = 3


def _old_block_match_motion_pallas(prev_gray, curr_gray, block=16, radius=8,
                                   interpret=False):
    """The round-3/4 prep, verbatim dataflow: full-frame halo pad, band
    dynamic-slice, lane-alignment pad, then _bm_pallas_call's internal
    ragged row pads. Kept here (not in the library) as the probe's A/B
    baseline after the round-5 fused-pad prep replaced it."""
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.kernels.motion_pallas import _bm_pallas_call, _round_up

    b, h, w = curr_gray.shape
    hb, wb = (h // block) * block, (w // block) * block
    curr = curr_gray[:, :hb, :wb].astype(jnp.float32)
    prev = prev_gray[:, :hb, :wb].astype(jnp.float32)
    prev_full = jnp.pad(prev, ((0, 0), (radius, radius), (radius, radius)),
                        mode="edge")
    BAND = 2048
    n_blocks_total = wb // block
    band_means, band_weights = [], []
    for b0 in range(0, wb, BAND):
        bw = min(BAND, wb - b0)
        wq = _round_up(bw, 128)
        wp = _round_up(wq + 2 * radius, 128)
        curr_b = curr[:, :, b0 : b0 + bw]
        if wq > bw:
            curr_b = jnp.pad(curr_b, ((0, 0), (0, 0), (0, wq - bw)),
                             mode="edge")
        prev_b = jax.lax.dynamic_slice(
            prev_full, (0, 0, b0), (b, hb + 2 * radius, bw + 2 * radius)
        )
        if wp > bw + 2 * radius:
            prev_b = jnp.pad(
                prev_b, ((0, 0), (0, 0), (0, wp - bw - 2 * radius)),
                mode="edge",
            )
        band_means.append(
            _bm_pallas_call(curr_b, prev_b, hb, wb, block, radius, interpret)
        )
        band_weights.append(bw // block)
    if len(band_means) == 1:
        return band_means[0]
    weights = jnp.asarray(band_weights, jnp.float32)
    stacked = jnp.stack(band_means, axis=-1)
    return jnp.sum(stacked * weights, axis=-1) / n_blocks_total


def main():
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    t0 = time.perf_counter()
    results: dict = {}

    def note(msg):
        print(f"[pyr] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    import bench
    from rtvqa_tpu.kernels import motion_pallas
    from rtvqa_tpu.metrics import complexity as cx
    from rtvqa_tpu.ops.motion import down2_mean

    gen, _ = bench.device_frame_fns(N, H, W)
    y, u, v = gen(0)

    @jax.jit
    def to_gray(y, tag):
        return y.astype(jnp.float32) + tag

    grays = [to_gray(y, jnp.float32(k * 0.125)) for k in range(REPS + 1)]
    ts = [
        jax.device_put((np.arange(N) * 33.3 + rep).astype(np.float32))
        for rep in range(REPS + 1)
    ]
    n_valid = np.int32(N)
    np.asarray(grays[-1][0, 0, :8])
    note("inputs staged")

    # --- build the timed variants -----------------------------------------
    @jax.jit
    def tiny(a, tag):
        return a[:8] + tag

    tags = [jnp.float32(k * 1e-6) for k in range(64)]

    @jax.jit
    def down2_sum(g):
        return jnp.sum(down2_mean(g), axis=(-2, -1))  # (N,) fetch

    @functools.partial(jax.jit, static_argnames=("impl",))
    def pyramid(g, impl):
        gh = down2_mean(g)
        if impl == "old":
            return 2.0 * _old_block_match_motion_pallas(
                gh[:-1], gh[1:], block=8, radius=4
            )
        return 2.0 * motion_pallas.block_match_motion_pallas(
            gh[:-1], gh[1:], block=8, radius=4
        )

    # Two FRESH jit instances of the suite body so each traces its own
    # motion prep (the module-level jitted suite caches by args only).
    suite_kw = dict(resize_h=64, resize_w=64, motion_impl="pallas")
    suite_new = jax.jit(
        cx.complexity_suite_packed.__wrapped__,
        static_argnames=(
            "resize_h", "resize_w", "alpha", "block", "radius", "edge_low",
            "edge_high", "motion_impl", "motion_search",
        ),
    )
    suite_old = jax.jit(
        cx.complexity_suite_packed.__wrapped__,
        static_argnames=(
            "resize_h", "resize_w", "alpha", "block", "radius", "edge_low",
            "edge_high", "motion_impl", "motion_search",
        ),
    )

    saved = motion_pallas.block_match_motion_pallas

    def run_suite_old(k):
        motion_pallas.block_match_motion_pallas = _old_block_match_motion_pallas
        try:
            return np.asarray(
                suite_old(y, u, v, ts[k], n_valid, **suite_kw)
            )
        finally:
            motion_pallas.block_match_motion_pallas = saved

    runs = {
        "floor": lambda k: np.asarray(tiny(ts[0], tags[k % 64])),
        "down2": lambda k: np.asarray(down2_sum(grays[k])),
        "pyr/old": lambda k: np.asarray(pyramid(grays[k], "old")),
        "pyr/new": lambda k: np.asarray(pyramid(grays[k], "new")),
        "suite/old": run_suite_old,
        "suite/new": lambda k: np.asarray(
            suite_new(y, u, v, ts[k], n_valid, **suite_kw)
        ),
    }

    for name, fn in runs.items():
        fn(REPS)  # warm/compile with the spare variant
        note(f"warm {name}")
    times: dict = {name: [] for name in runs}
    for r in range(REPS):
        for name, fn in runs.items():
            t1 = time.perf_counter()
            fn(r)
            times[name].append(time.perf_counter() - t1)
    for name, ts_ in times.items():
        results[name] = {"median_ms": round(float(np.median(ts_)) * 1e3, 2),
                         "all_ms": [round(x * 1e3, 2) for x in ts_]}
        note(f"{name}: {results[name]}")

    # --- equality checks ----------------------------------------------------
    po = np.asarray(pyramid(grays[0], "old"))
    pn = np.asarray(pyramid(grays[0], "new"))
    results["eq/pyramid_bitwise"] = bool(np.array_equal(po, pn))
    so = run_suite_old(0)
    sn = np.asarray(suite_new(y, u, v, ts[0], n_valid, **suite_kw))
    results["eq/suite_bitwise"] = bool(np.array_equal(so, sn))
    results["eq/suite_max_abs"] = float(np.max(np.abs(so - sn)))
    note(f"eq: {results['eq/pyramid_bitwise']} {results['eq/suite_bitwise']} "
         f"{results['eq/suite_max_abs']}")

    print("PROBE_JSON " + json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
