"""Bilinear resize as separable matmuls (MXU path).

The reference resizes every frame on the host with ``cv2.resize`` default
``INTER_LINEAR`` (``complexity_metrics.py:359, 379, 405, 431, 491, 530``).
Geometry: half-pixel centers, ``src = (dst + 0.5) * scale - 0.5``, clamped, no
antialiasing. On TPU, a separable bilinear resize is exactly a pair of dense
contractions ``R_h @ X @ R_w^T`` with precomputed (static-shape) weight
matrices — which puts the op on the MXU and lets XLA fuse it with the
downstream DCT matmuls (the DCT-energy path becomes one matmul chain).

Note this is *not* ``jax.image.resize`` semantics: that antialiases on
downscale by default; cv2 does not. The weight matrices are built at trace
time from static shapes and get baked into the executable as constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(dst: int, src: int) -> np.ndarray:
    """(dst, src) row-stochastic bilinear interpolation matrix, cv2 geometry."""
    m = np.zeros((dst, src), dtype=np.float32)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        frac = x - x0
        lo = min(max(x0, 0), src - 1)
        hi = min(max(x0 + 1, 0), src - 1)
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize (..., H, W) float array to (..., out_h, out_w), cv2 INTER_LINEAR
    geometry (no antialias). Runs as two MXU contractions."""
    h, w = x.shape[-2], x.shape[-1]
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x = x.astype(dtype)
    if h != out_h:
        rh = jnp.asarray(_bilinear_matrix(out_h, h), dtype=dtype)
        x = jnp.einsum("oh,...hw->...ow", rh, x, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST)
    if w != out_w:
        rw = jnp.asarray(_bilinear_matrix(out_w, w), dtype=dtype)
        x = jnp.einsum("pw,...hw->...hp", rw, x, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST)
    return x


def resize_bilinear_np(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """NumPy oracle with identical geometry (float path of cv2.resize)."""
    x = x.astype(np.float64)
    h, w = x.shape[-2], x.shape[-1]
    rh = _bilinear_matrix(out_h, h).astype(np.float64)
    rw = _bilinear_matrix(out_w, w).astype(np.float64)
    y = np.einsum("oh,...hw->...ow", rh, x)
    return np.einsum("pw,...hw->...hp", rw, y)
