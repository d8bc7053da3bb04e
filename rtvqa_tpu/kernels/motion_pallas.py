"""Pallas TPU kernel: full-search block-matching motion.

The XLA formulation (`ops.motion.block_match_motion`) scans over the
(2r+1)^2 candidate displacements, and each scan step re-streams both frames
from HBM — ~2.4 GB of HBM traffic per 1080p frame pair at r=8. This kernel
tiles the frame into block-row strips, stages each strip (plus its 2r halo
rows from the previous frame) in VMEM once, and runs the entire displacement
search on-chip: HBM traffic drops to one read of each frame (~300x less).

Grid: (batch, n_strips). Per cell:
  * curr strip: (BLOCK, Wq) pipelined in via BlockSpec;
  * prev strip: (BLOCK + 2r, Wq) — strips overlap by 2r rows, which
    BlockSpec's block-granular index maps can't express, so the previous
    frame stays in HBM (`pltpu.ANY`) and the kernel DMAs its strip+halo into
    VMEM scratch explicitly;
  * fori_loop over the (2r+1)^2 displacements — each step is a dynamic VMEM
    slice + |diff| + per-block reshape-reduction, carrying a running
    (n_blocks,) SAD argmin (first minimum wins, as in the XLA op);
  * output: the strip's mean best-displacement magnitude, broadcast across a
    128-lane VMEM row (TPU lowering requires lane-aligned output blocks).
    All strips hold the same block count, so the host-side mean over strips
    equals the reference's global block mean.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bm_kernel(
    curr_ref, prev_hbm_ref, out_ref, prev_vmem, sem,
    *, block, radius, wb, kb, n_blockrows,
):
    i = pl.program_id(0)
    s = pl.program_id(1)
    rows = kb * block + 2 * radius

    dma = pltpu.make_async_copy(
        prev_hbm_ref.at[i, pl.ds(s * kb * block, rows), :],
        prev_vmem,
        sem,
    )
    dma.start()

    curr = curr_ref[0]  # (kb*block, wq) — kb block-rows per grid cell,
    # amortizing the ~15 us Mosaic grid + DMA overhead per cell (the
    # dominant kernel cost at 1080p; one block-row per cell measured
    # ~1.4 ms/frame of pure overhead at 67 cells).
    wq = curr.shape[1]
    n_blocks = wb // block
    nb_pad = ((n_blocks + 127) // 128) * 128  # lane-aligned block count (4K+)
    side = 2 * radius + 1
    rows_total = kb * block + 2 * radius

    # Block-pooling matrix: P[j, c] = 1 iff lane j belongs to block c and
    # j < wb (masks the lane padding). One (wq, nb_pad) matrix per call; the
    # host wrapper splits wide frames into <=2048-lane column bands, so this
    # stays ~1 MB of VMEM.
    lane_j = jax.lax.broadcasted_iota(jnp.int32, (wq, nb_pad), 0)
    block_c = jax.lax.broadcasted_iota(jnp.int32, (wq, nb_pad), 1)
    pool = ((lane_j // block == block_c) & (lane_j < wb)).astype(jnp.float32)

    def pool_rows(cs):
        return jnp.dot(cs, pool, preferred_element_type=jnp.float32)

    dma.wait()

    # Static-shift rolls (Mosaic rejects dynamic sublane offsets; static
    # rotates lower to cheap lane/sublane shifts). Row-roll once per dy,
    # lane-roll per dx. The search is chunked by dy: each chunk pools its
    # `side` SAD rows and folds into a running argmin — bounding live VMEM
    # values to one chunk (an all-289-row concat kept too many values alive
    # and could crash the worker when fused into larger programs).
    strip = prev_vmem[...]
    best_sad = [jnp.full((1, nb_pad), jnp.inf, jnp.float32) for _ in range(kb)]
    best_k = [jnp.zeros((1, nb_pad), jnp.int32) for _ in range(kb)]
    for dy in range(side):
        rows_rolled = pltpu.roll(strip, rows_total - dy, axis=0)[: kb * block]
        colsums = [[] for _ in range(kb)]
        for dx in range(side):
            win = pltpu.roll(rows_rolled, prev_vmem.shape[1] - dx, axis=1)[:, :wq]
            d = jnp.abs(curr - win)                                  # (kb*block, wq)
            for g in range(kb):
                colsums[g].append(
                    jnp.sum(d[g * block : (g + 1) * block], axis=0, keepdims=True)
                )                                                    # (1, wq)
        for g in range(kb):
            cs = jnp.concatenate(colsums[g], axis=0)                 # (side, wq)
            sad = pool_rows(cs)                                      # (side, nb_pad)
            sad = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, sad.shape, 1) < n_blocks,
                sad, jnp.inf,
            )
            k_local = jnp.argmin(sad, axis=0).reshape(1, nb_pad).astype(jnp.int32)
            m = jnp.min(sad, axis=0).reshape(1, nb_pad)
            # Strict '<' keeps the earlier (raster-order) chunk on ties, and
            # argmin's first-occurrence rule handles ties within a chunk —
            # the XLA op's first-minimum tie-breaking exactly.
            better = m < best_sad[g]
            best_k[g] = jnp.where(better, dy * side + k_local, best_k[g])
            best_sad[g] = jnp.where(better, m, best_sad[g])

    lane_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, nb_pad), 1) < n_blocks
    ).astype(jnp.float32)
    sum_mag = 0.0
    for g in range(kb):
        fdy = (best_k[g] // side - radius).astype(jnp.float32)
        fdx = (best_k[g] % side - radius).astype(jnp.float32)
        mag = jnp.sqrt(fdy * fdy + fdx * fdx)                        # (1, nb_pad)
        # Mask block-rows beyond the frame (ragged last cell).
        valid = s * kb + g < n_blockrows
        sum_mag = sum_mag + jnp.where(valid, jnp.sum(mag * lane_mask), 0.0)
    # TPU lowering rejects sub-(8,128) output blocks; write a 128-lane row.
    # Partial SUM per cell (cells may hold unequal valid row counts); the
    # host divides by the global block count.
    out_ref[0, s, :] = jnp.full((128,), sum_mag, jnp.float32)


def _bm_grid_config(wq, hb, block, radius, kb_over=None):
    """(kb, n_strips, hb2) for a band of wq lanes and hb valid rows.

    ``kb_over`` overrides the block-rows-per-cell ladder (probe knob —
    round-5 strip-height sweeps; still clamped to n_blockrows).

    Block-rows per grid cell: taller cells amortize the ~15-25 us Mosaic
    grid + DMA cost (the half-res pyramid search was overhead-bound at
    kb=4), but the unrolled displacement loop's scoped-VMEM temporaries
    scale with side x cell-rows x lanes: kb=8/block=16/r=8 at 2048 lanes
    (4.45M units) measured 78 MB > the 64 MB budget, while the known-good
    configs sit at <= 2.2M units (kb=4 full-res) and 1.18M (kb=16
    half-res). Budget on that unit product — NOT on block alone: a direct
    full-radius call with small blocks (block=8, r=8, 1920 lanes) must
    stay at kb=4, only the halved-radius pyramid shapes afford kb=16.

    When the budget affords it, target THREE strips per band instead of
    the kb=16 ladder: at 1080p half-res (67 block-rows) kb=23 cuts the
    grid from 5 cells/640 padded rows to 3 cells/552 and measured
    51.5 -> 48.7 ms on the 128-frame suite (probes/KB23_AB_r05.json —
    interleaved A/B, every rep faster). TWO strips (kb=34) gives the win
    back (51.0 ms), and at 1440p/4K the lever is neutral
    (probes/KB_WIDE_r05.json) — 3 is the floor, not a scaling rule.
    """
    n_blockrows = hb // block
    side_u = 2 * radius + 1
    budget_kb = 3_000_000 // max(side_u * block * wq, 1)
    if kb_over is not None:
        kb = kb_over
    else:
        target3 = -(-n_blockrows // 3)
        if 16 <= target3 <= budget_kb:
            kb = target3
        else:
            kb = 16 if budget_kb >= 16 else (4 if budget_kb >= 4 else max(1, budget_kb))
    kb = min(kb, n_blockrows)
    n_strips = -(-n_blockrows // kb)
    return kb, n_strips, n_strips * kb * block


def _bm_pallas_call(curr_p, prev_p, hb, wb, block, radius, interpret,
                    kb_over=None):
    """Invoke the kernel on lane-aligned, pre-padded band arrays.

    curr_p: (B, hb, wq); prev_p: (B, hb + 2r, wp) with wp >= wq + 2r and the
    horizontal/vertical halos already filled (real neighbor data for interior
    band edges, edge replication at frame borders). Callers may pass arrays
    already row-padded to the grid height hb2 (fused-pad prep, round 5) —
    detected by shape, skipping the internal ragged pad."""
    b = curr_p.shape[0]
    wq = curr_p.shape[2]
    n_blockrows = hb // block
    kb, n_strips, hb2 = _bm_grid_config(wq, hb, block, radius, kb_over)
    if hb2 > curr_p.shape[1]:  # ragged: pad rows (masked via n_blockrows)
        curr_p = jnp.pad(
            curr_p, ((0, 0), (0, hb2 - curr_p.shape[1]), (0, 0)), mode="edge"
        )
    if hb2 + 2 * radius > prev_p.shape[1]:
        prev_p = jnp.pad(
            prev_p,
            ((0, 0), (0, hb2 + 2 * radius - prev_p.shape[1]), (0, 0)),
            mode="edge",
        )
    rows = kb * block + 2 * radius
    out = pl.pallas_call(
        functools.partial(
            _bm_kernel, block=block, radius=radius, wb=wb,
            kb=kb, n_blockrows=n_blockrows,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_strips, 128), jnp.float32),
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec(
                (1, kb * block, wq), lambda i, s: (i, s, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, n_strips, 128), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, prev_p.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        # Mosaic's default 16 MB scoped-vmem budget counts the unrolled
        # displacement loop's temporaries cumulatively (~9 MB at kb=1);
        # the chip has 128 MB of VMEM — raise the budget so kb=4 strips
        # (which amortize per-cell grid+DMA overhead 4x) compile.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(curr_p, prev_p)
    n_blocks = wb // block
    return jnp.sum(out[..., 0], axis=-1) / (n_blockrows * n_blocks)


@functools.partial(
    jax.jit, static_argnames=("block", "radius", "interpret", "kb")
)
def block_match_motion_pallas(
    prev_gray: jnp.ndarray,
    curr_gray: jnp.ndarray,
    block: int = 16,
    radius: int = 8,
    interpret: bool = False,
    kb: int | None = None,
) -> jnp.ndarray:
    """Mean block displacement magnitude per pair: (B, H, W) -> (B,).

    Numerically identical to `ops.motion.block_match_motion` (same
    first-minimum tie-breaking, same edge replication). Frames wider than
    2048 px (4K) are processed as column bands of <=2048 lanes — keeping the
    kernel's VMEM footprint bounded — with each interior band's search
    window drawn from the real neighboring pixels of the full padded
    previous frame.
    """
    b, h, w = curr_gray.shape
    hb, wb = (h // block) * block, (w // block) * block
    curr = curr_gray[:, :hb, :wb].astype(jnp.float32)
    prev = prev_gray[:, :hb, :wb].astype(jnp.float32)

    BAND = 2048
    if wb <= BAND:
        # Single-band fast path (every production shape except full-res 4K
        # search): build each kernel operand with ONE fused jnp.pad — halo,
        # lane alignment, and the ragged-grid row pad together. Edge-mode
        # pads compose, so this is bitwise-identical to the old sequential
        # form (halo pad -> band lane pad -> ragged row pads; tests/
        # test_motion_pallas.py + on-device eq). On-device A/B (round 5,
        # scripts/probe_pyramid_stages.py): NEUTRAL — pyramid 54.9 old vs
        # 55.9 new ms incl. ~29 ms floor, suite 74.2 vs 76.0, overlapping
        # reps. XLA had already fused the sequential pads; VERDICT r4's
        # "~12 ms pads/overheads" line was session variance, not pad
        # copies. The fused form is kept as the simpler expression (one
        # pad per operand), not as a perf win.
        wq = _round_up(wb, 128)
        wp = _round_up(wq + 2 * radius, 128)
        _, _, hb2 = _bm_grid_config(wq, hb, block, radius, kb)
        curr_p = curr
        if hb2 > hb or wq > wb:
            curr_p = jnp.pad(
                curr, ((0, 0), (0, hb2 - hb), (0, wq - wb)), mode="edge"
            )
        prev_p = jnp.pad(
            prev,
            ((0, 0), (radius, radius + hb2 - hb), (radius, wp - wb - radius)),
            mode="edge",
        )
        return _bm_pallas_call(curr_p, prev_p, hb, wb, block, radius,
                               interpret, kb)

    # Full-frame halo: pad prev by r with edge replication (vertically and
    # horizontally); bands slice real halo data out of this array.
    prev_full = jnp.pad(prev, ((0, 0), (radius, radius), (radius, radius)),
                        mode="edge")
    n_blocks_total = wb // block
    band_means = []
    band_weights = []
    for b0 in range(0, wb, BAND):
        bw = min(BAND, wb - b0)             # band width (multiple of block)
        wq = _round_up(bw, 128)
        wp = _round_up(wq + 2 * radius, 128)
        curr_b = curr[:, :, b0 : b0 + bw]
        if wq > bw:
            curr_b = jnp.pad(curr_b, ((0, 0), (0, 0), (0, wq - bw)), mode="edge")
        # prev band: [b0 - r, b0 + bw + r) in original coords = padded
        # [b0, b0 + bw + 2r); extend with edge padding up to wp.
        prev_b = jax.lax.dynamic_slice(
            prev_full, (0, 0, b0), (b, hb + 2 * radius, bw + 2 * radius)
        )
        if wp > bw + 2 * radius:
            prev_b = jnp.pad(
                prev_b, ((0, 0), (0, 0), (0, wp - bw - 2 * radius)), mode="edge"
            )
        band_means.append(
            _bm_pallas_call(curr_b, prev_b, hb, bw, block, radius,
                            interpret, kb)
        )
        band_weights.append(bw // block)

    if len(band_means) == 1:
        return band_means[0]
    weights = jnp.asarray(band_weights, jnp.float32)
    stacked = jnp.stack(band_means, axis=-1)          # (B, n_bands)
    return jnp.sum(stacked * weights, axis=-1) / n_blocks_total
