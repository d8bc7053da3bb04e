"""Separable filtering primitives for the VMAF feature extractors.

All VMAF features are built on 1D separable convolutions over the luma plane
(Gaussian windows for VIF, a 5-tap binomial-like blur for motion, db2 wavelet
taps for ADM). On TPU these run as batched matmul contractions against
precomputed band matrices — same trick as `ops.resize`: a 1D convolution with
reflected borders is a (H, H) banded matrix applied to the rows/columns, which
XLA maps onto the MXU. For the small windows used here (3..17 taps) the dense
band matrix is built once per (length, kernel) at trace time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel(n: int, sigma: float) -> np.ndarray:
    """Symmetric normalized Gaussian window of ``n`` taps (libvmaf VIF form)."""
    x = np.arange(n, dtype=np.float64) - (n - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float64)


@functools.lru_cache(maxsize=256)
def _conv_matrix(length: int, taps: tuple, mode: str) -> np.ndarray:
    """(length, length) matrix equal to 1D convolution with border handling.

    ``mode``: 'reflect' mirrors without repeating the edge sample (scipy
    'mirror' / libvmaf's vif_filter1d border handling).
    """
    taps_a = np.asarray(taps, dtype=np.float64)
    n = len(taps_a)
    half = n // 2
    m = np.zeros((length, length), dtype=np.float64)
    for i in range(length):
        for t in range(n):
            j = i + t - half
            if mode == "reflect":
                if j < 0:
                    j = -j
                elif j >= length:
                    j = 2 * length - 2 - j
                j = int(np.clip(j, 0, length - 1))
            elif mode == "edge":
                j = int(np.clip(j, 0, length - 1))
            else:
                raise ValueError(mode)
            m[i, j] += taps_a[t]
    return m


def filter1d_sep(
    x: jnp.ndarray, taps: np.ndarray, mode: str = "reflect"
) -> jnp.ndarray:
    """Separable 2D filter over trailing (H, W) axes via two MXU contractions."""
    h, w = x.shape[-2], x.shape[-1]
    t = tuple(float(v) for v in np.asarray(taps, dtype=np.float64))
    mh = jnp.asarray(_conv_matrix(h, t, mode), dtype=jnp.float32)
    mw = jnp.asarray(_conv_matrix(w, t, mode), dtype=jnp.float32)
    x = x.astype(jnp.float32)
    y = jnp.einsum(
        "oh,...hw->...ow", mh, x,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.einsum(
        "pw,...hw->...hp", mw, y,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )


def filter1d_sep_axis(
    x: jnp.ndarray, taps: np.ndarray, axis: int, mode: str = "reflect"
) -> jnp.ndarray:
    """1D convolution along one of the trailing two axes (reflect borders)."""
    assert axis in (-1, -2)
    length = x.shape[axis]
    t = tuple(float(v) for v in np.asarray(taps, dtype=np.float64))
    m = jnp.asarray(_conv_matrix(length, t, mode), dtype=jnp.float32)
    x = x.astype(jnp.float32)
    eq = "oh,...hw->...ow" if axis == -2 else "pw,...hw->...hp"
    return jnp.einsum(
        eq, m, x,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )


def filter1d_sep_axis_np(x: np.ndarray, taps: np.ndarray, axis: int, mode: str = "reflect") -> np.ndarray:
    assert axis in (-1, -2)
    length = x.shape[axis]
    t = tuple(float(v) for v in np.asarray(taps, dtype=np.float64))
    m = _conv_matrix(length, t, mode)
    eq = "oh,...hw->...ow" if axis == -2 else "pw,...hw->...hp"
    return np.einsum(eq, m, x.astype(np.float64))


def decimate2(x: jnp.ndarray) -> jnp.ndarray:
    """Subsample trailing (H, W) by 2 (keep even indices, libvmaf style)."""
    return x[..., ::2, ::2]


# --- NumPy oracle ----------------------------------------------------------


def filter1d_sep_np(x: np.ndarray, taps: np.ndarray, mode: str = "reflect") -> np.ndarray:
    h, w = x.shape[-2], x.shape[-1]
    t = tuple(float(v) for v in np.asarray(taps, dtype=np.float64))
    mh = _conv_matrix(h, t, mode)
    mw = _conv_matrix(w, t, mode)
    y = np.einsum("oh,...hw->...ow", mh, x.astype(np.float64))
    return np.einsum("pw,...hw->...hp", mw, y)
