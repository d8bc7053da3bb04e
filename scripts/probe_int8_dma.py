"""Device probe: can Mosaic DMA int8 HBM->VMEM at 8-aligned dynamic row
offsets (the raw-input quality kernels' windowing), and what does the
uint8->f32 conversion cost in-kernel?

Background (round 3i): quality_fused_pallas + adm_features_pallas read an
XLA `astype(f32)` of the uint8 luma — ~6.5 GB of HBM traffic per 128x1080p
chunk (2 GB astype write + 2 GB read per kernel + the u8 read). int8 operands
DMA'd raw would cut that to ~1 GB. gray_pallas proved int8 BlockSpec blocks
at 32-aligned offsets work; this probes the quality kernels' 8-aligned
`pl.ds(st, rows)` windows on an int8 array.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_int8_dma.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

H, W = 1080, 1920
N = 16
STRIP = 32
ROWS = STRIP + 16


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache
    from rtvqa_tpu.kernels.vif_pallas import _dma_row_start

    enable_persistent_cache()
    t0 = time.perf_counter()

    def note(msg):
        print(f"[probe] {msg} (+{time.perf_counter() - t0:.1f}s)", flush=True)

    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    n_strips = -(-H // STRIP)

    def kernel(x_hbm, out_ref, buf, sem, *, as_int8):
        s = pl.program_id(0)
        i = pl.program_id(1)
        row0 = s * STRIP
        st = _dma_row_start(row0, H, ROWS)
        ro = row0 - st
        dma = pltpu.make_async_copy(x_hbm.at[i, pl.ds(st, ROWS), :], buf, sem)
        dma.start()
        dma.wait()
        v = buf[...]
        if as_int8:
            f = v.astype(jnp.float32)
            f = f + 256.0 * (f < 0)
        else:
            f = v
        # sum the strip's valid rows via an iota mask on the dynamic offset
        r = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)
        valid = (r >= ro) & (r < ro + jnp.minimum(STRIP, H - row0))
        out_ref[0, s, :] = jnp.full((128,), jnp.sum(jnp.where(valid, f, 0.0)))

    def run(x, as_int8):
        return pl.pallas_call(
            functools.partial(kernel, as_int8=as_int8),
            out_shape=jax.ShapeDtypeStruct((x.shape[0], n_strips, 128), jnp.float32),
            grid=(n_strips, x.shape[0]),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, n_strips, 128), lambda s, i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ROWS, W), jnp.int8 if as_int8 else jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(x)

    @jax.jit
    def probe_i8(xu8):
        x8 = jax.lax.bitcast_convert_type(xu8, jnp.int8)
        return jnp.sum(run(x8, True)[:, :, 0], axis=1)

    @jax.jit
    def probe_f32(xu8):
        return jnp.sum(run(xu8.astype(jnp.float32), False)[:, :, 0], axis=1)

    rng = np.random.default_rng(0)
    xs = [jax.device_put(rng.integers(0, 256, (N, H, W), np.uint8))
          for _ in range(3)]

    # correctness
    got = np.asarray(probe_i8(xs[0]))
    want = np.asarray(
        jax.jit(lambda x: jnp.sum(x.astype(jnp.float32), axis=(1, 2)))(xs[0])
    )
    err = float(np.max(np.abs(got - want) / np.maximum(want, 1.0)))
    note(f"int8 8-aligned-DMA correctness: max_rel_err={err:.3g} "
         f"{'PASS' if err < 1e-6 else 'FAIL'}")

    # timing A/B (distinct inputs per rep: the tunnel memoizes)
    for name, fn in (("f32 (astype prep)", probe_f32), ("int8 raw", probe_i8)):
        for x in xs:
            np.asarray(fn(x))  # warm + compile
        ts = []
        for x in xs:
            t = time.perf_counter()
            np.asarray(fn(x))
            ts.append(time.perf_counter() - t)
        note(f"{name}: {1000 * min(ts):.1f} ms (N={N})")


if __name__ == "__main__":
    main()
