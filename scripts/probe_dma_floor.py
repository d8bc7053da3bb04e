"""Measure the device's raw HBM bandwidth and the Pallas strip-DMA floor.

Motivation (round 3d): three structural ADM changes in a row were NEUTRAL at
~105 ms / 128x1080p (strip doubling, lane-width halving, double-buffered
DMA).  The kernels move ~2.4-4 GB per call; 105 ms implies ~40-55 GB/s
effective — far below nominal HBM rates.  This probe separates:

  1. XLA reduction bandwidth  (read-only:  sum(x))
  2. XLA copy bandwidth       (read+write: x + 1)
  3. Pallas strip-DMA floor   (the exact ADM input DMA pattern, no compute)
  4. dtype scaling            (f32 vs bf16 vs uint8 inputs)

If (3) tracks bytes across dtypes, the kernels are DMA-byte-bound and
narrow input dtypes (uint8 video is EXACT in bf16) are the framework-wide
lever.  If (1)/(2) are fast but (3) is slow, Mosaic strided strip copies are
the problem, not the wire.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dma_floor.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

N, H, W = 128, 1088, 2176  # padded 1080p luma, matches the ADM input shape
REPS = 3
STRIP = 24  # ADM rows_out strip at 1080p -> rows_in = 2*24+8 = 56


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    t0 = time.perf_counter()

    def note(msg):
        print(f"[dma] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    # On-device synthesized inputs (never uploaded; distinct per rep to beat
    # the tunnel's (program, inputs) memoization).
    @functools.partial(jax.jit, static_argnames=("dtype",))
    def synth(seed, dtype):
        x = jax.random.uniform(jax.random.PRNGKey(seed), (N, H, W)) * 255.0
        return x.astype(dtype)

    def timed(fn, args_per_rep):
        outs = [None] * len(args_per_rep)
        np.asarray(fn(*args_per_rep[0]))  # warm/compile
        ts = []
        for i, a in enumerate(args_per_rep):
            t1 = time.perf_counter()
            outs[i] = np.asarray(fn(*a))
            ts.append(time.perf_counter() - t1)
        return sorted(ts)[len(ts) // 2], outs[0]

    # --- 1/2: XLA bandwidth ------------------------------------------------
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16"),
                        (jnp.uint8, "u8")):
        xs = [synth(7 + r, dtype) for r in range(REPS)]
        for x in xs:
            x.block_until_ready()
        nbytes = int(np.prod(x.shape)) * x.dtype.itemsize

        red = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
        t, _ = timed(red, [(x,) for x in xs])
        print(f"[dma] xla_sum[{name}]: {t*1e3:.1f} ms "
              f"({nbytes/t/1e9:.1f} GB/s read)", flush=True)

        cp = jax.jit(lambda v: v + jnp.ones((), v.dtype))
        # copy returns the full array -> fetching it would swamp the wire;
        # chain into a tiny reduction instead so only 8 bytes come back.
        cpr = jax.jit(lambda v: jnp.sum((v + jnp.ones((), v.dtype))[::64, ::64, ::64].astype(jnp.float32)))
        t, _ = timed(cpr, [(x,) for x in xs])
        print(f"[dma] xla_copy[{name}]: {t*1e3:.1f} ms "
              f"({2*nbytes/t/1e9:.1f} GB/s r+w)", flush=True)

    # --- 3/4: Pallas strip-DMA floor (ADM input pattern, zero compute) -----
    def dma_kernel(x_hbm, out_ref, buf, sem, *, rows_in, n_s):
        i = pl.program_id(0)
        s = pl.program_id(1)
        k = i * n_s + s
        slot = jax.lax.rem(k, 2)

        def cp(kk, sl):
            ii = kk // n_s
            ss = jax.lax.rem(kk, n_s)
            return pltpu.make_async_copy(
                x_hbm.at[ii, pl.ds(2 * ss * STRIP, rows_in), :],
                buf.at[sl], sem.at[sl])

        @pl.when(k == 0)
        def _():
            cp(k, slot).start()

        @pl.when(k + 1 < pl.num_programs(0) * n_s)
        def _():
            cp(k + 1, 1 - slot).start()

        cp(k, slot).wait()
        # one cheap touch so the DMA isn't dead-code eliminated
        out_ref[0, s] = jnp.sum(buf[slot][:1, :128].astype(jnp.float32), axis=0)

    n_s = H // (2 * STRIP)  # 22 strips reading 56 rows each (~1.18x bytes)
    rows_in = 2 * STRIP + 8

    def make_floor(dtype, name):
        @jax.jit
        def floor(x):
            return pl.pallas_call(
                functools.partial(dma_kernel, rows_in=rows_in, n_s=n_s),
                out_shape=jax.ShapeDtypeStruct((N, n_s, 128), jnp.float32),
                grid=(N, n_s),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((1, n_s, 128), lambda i, s: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, rows_in, W), dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )(x)[:, :, 0].sum()
        return floor

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16"),
                        (jnp.uint8, "u8")):
        xs = [synth(19 + r, dtype) for r in range(REPS)]
        for x in xs:
            x.block_until_ready()
        nbytes = N * n_s * rows_in * W * jnp.dtype(dtype).itemsize
        try:
            t, _ = timed(make_floor(dtype, name), [(x,) for x in xs])
            print(f"[dma] pallas_strip_dma[{name}]: {t*1e3:.1f} ms "
                  f"({nbytes/t/1e9:.1f} GB/s)", flush=True)
        except Exception as e:
            print(f"[dma] pallas_strip_dma[{name}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
