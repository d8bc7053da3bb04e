"""A/B the filter-matmul precision (RTVQA_FILTER_PRECISION) on the device.

Runs the fused quality chunk at 128x1080p under the CURRENT precision env
and reports timing + (vs a replicated XLA float32 reference on small batch)
the feature error. Run twice:

    RTVQA_FILTER_PRECISION=highest python scripts/precision_ab.py
    RTVQA_FILTER_PRECISION=fast3   python scripts/precision_ab.py

FAST3 = the manual 3-pass bf16 scheme (kernels.vif_pallas), auto-gated to
VIF scales <= 1. Round-3 measurements (128x1080p fused chunk):
HIGHEST 278 ms; FAST3 247.7 ms (-11%); feature max_rel_err ~2e-4 at scale 0,
~5e-4 at scale 1 with the gating (ungated all-scale FAST3 compounded to
~4e-3 at scale 3 — why the gate exists).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

H, W, N = 1080, 1920, 128
REPS = 2


def main():
    import jax
    import jax.numpy as jnp

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    mode = os.environ.get("RTVQA_FILTER_PRECISION", "HIGHEST").upper()
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    print(f"[{mode}] sync +{time.perf_counter() - t0:.0f}s", flush=True)

    @jax.jit
    def gen(seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        fi = jax.lax.broadcasted_iota(jnp.int32, (N, H, W), 0)
        yy = jax.lax.broadcasted_iota(jnp.int32, (N, H, W), 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (N, H, W), 2)
        base = (xx * 3 + yy * 2 + 7 * fi) % 256
        y = jnp.clip(
            base + jax.random.randint(k1, (N, H, W), 0, 8, jnp.int32), 0, 255
        ).astype(jnp.uint8)
        u = jax.random.randint(
            k2, (N, H // 2, W // 2), 100, 156, jnp.int32
        ).astype(jnp.uint8)
        return y, u

    @jax.jit
    def distort(y, seed):
        n = jax.random.randint(jax.random.PRNGKey(seed), y.shape, -4, 5, jnp.int16)
        return jnp.clip(y.astype(jnp.int16) + n, 0, 255).astype(jnp.uint8)

    ry, ru = gen(0)
    dy = distort(ry, 1)
    np.asarray(dy[0, 0, :8])
    print(f"[{mode}] staged +{time.perf_counter() - t0:.0f}s", flush=True)

    from rtvqa_tpu.metrics.full_reference import _program_chunk

    fill = jax.jit(lambda c: jnp.full((H, W), c, jnp.float32))
    blurs = [fill(np.float32(1e-3 * (k + 1))) for k in range(REPS + 1)]

    def run(blur):
        packed, _ = _program_chunk(ry, ru, ru, dy, ru, ru, blur, True)
        return np.asarray(packed)

    run(blurs[-1])
    t1 = time.perf_counter()
    for k in range(REPS):
        last = run(blurs[k])
    dt = (time.perf_counter() - t1) / REPS
    print(f"[{mode}] fused chunk: {dt * 1000:.1f} ms ({N / dt:.1f} f/s)", flush=True)

    # Feature accuracy vs the PURE-XLA float32 reference, small batch (the
    # XLA full-res VIF+ADM only compiles at ~16 1080p frames).
    from rtvqa_tpu.metrics.full_reference import CHUNK_KEYS, _program_a
    from rtvqa_tpu.vmaf.adm import adm_features
    from rtvqa_tpu.vmaf.vif import vif_features

    nb = 8
    pa, _ = _program_a(ry[:nb], ru[:nb], ru[:nb], dy[:nb], ru[:nb], ru[:nb],
                       blurs[REPS - 1], True)
    ryf = ry[:nb].astype(jnp.float32)
    dyf = dy[:nb].astype(jnp.float32)
    bx = {}
    bx.update({k: np.asarray(v) for k, v in vif_features(ryf, dyf).items()})
    bx.update({k: np.asarray(v) for k, v in adm_features(ryf, dyf).items()})
    pa = np.asarray(pa)
    got = last[:, :nb]
    for row, key in enumerate(CHUNK_KEYS):
        b = bx[key] if key in bx else pa[row]
        a = got[row]
        rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-9))
        print(f"[{mode}] {key}: max_rel_err {rel:.3g}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
