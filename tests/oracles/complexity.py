"""Independent NumPy/SciPy oracles for the complexity ops.

Deliberately written in naive loop/scipy style (not mirroring the JAX code)
so agreement is meaningful. These mirror the *intended* CPU semantics of the
reference kernels (complexity_metrics.py:313-579).
"""

from __future__ import annotations

import numpy as np
import scipy.fft


def dct2(x: np.ndarray) -> np.ndarray:
    return scipy.fft.dct(
        scipy.fft.dct(x.astype(np.float64), axis=-1, norm="ortho"),
        axis=-2,
        norm="ortho",
    )


def dct_energy(gray: np.ndarray) -> float:
    return float(np.sum(dct2(gray) ** 2))


def temporal_dct(prev_gray: np.ndarray, curr_gray: np.ndarray) -> float:
    return float(np.sum(np.abs(dct2(prev_gray.astype(np.float64)) - dct2(curr_gray.astype(np.float64)))))


def gray_entropy(gray_u8: np.ndarray) -> float:
    hist = np.bincount(gray_u8.ravel(), minlength=256).astype(np.float64)
    p = hist / hist.sum()
    p = p[p > 0]
    return float(-np.sum(p * np.log2(p)))


def color_entropy(rgb_u8: np.ndarray) -> float:
    total = 0.0
    for c in range(3):
        hist = np.bincount(rgb_u8[..., c].ravel(), minlength=256).astype(np.float64)
        p = hist / hist.sum()
        total += -np.sum(p * np.log2(p + 1e-8))
    return float(total)


def sobel(gray: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    g = np.pad(gray.astype(np.float64), 1, mode="edge")
    h, w = gray.shape
    gx = np.zeros((h, w))
    gy = np.zeros((h, w))
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float64)
    ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float64)
    for i in range(h):
        for j in range(w):
            win = g[i : i + 3, j : j + 3]
            gx[i, j] = np.sum(win * kx)
            gy[i, j] = np.sum(win * ky)
    return gx, gy


def canny(gray: np.ndarray, low=100.0, high=200.0) -> np.ndarray:
    """Canny with cv2-style sector NMS + 8-connected hysteresis (L1 norm)."""
    gx, gy = sobel(gray)
    mag = np.abs(gx) + np.abs(gy)
    h, w = mag.shape
    tg22, tg67 = np.tan(np.deg2rad(22.5)), np.tan(np.deg2rad(67.5))

    def m_at(i, j):
        return mag[min(max(i, 0), h - 1), min(max(j, 0), w - 1)]

    nms = np.zeros_like(mag)
    for i in range(h):
        for j in range(w):
            m = mag[i, j]
            ax, ay = abs(gx[i, j]), abs(gy[i, j])
            if ay <= tg22 * ax:
                n1, n2 = m_at(i, j + 1), m_at(i, j - 1)
            elif ay >= tg67 * ax:
                n1, n2 = m_at(i + 1, j), m_at(i - 1, j)
            elif gx[i, j] * gy[i, j] >= 0:
                n1, n2 = m_at(i + 1, j + 1), m_at(i - 1, j - 1)
            else:
                n1, n2 = m_at(i + 1, j - 1), m_at(i - 1, j + 1)
            if m > n1 and m >= n2:
                nms[i, j] = m

    strong = nms > high
    weak = nms > low
    edges = strong.copy()
    changed = True
    while changed:
        changed = False
        grown = np.zeros_like(edges)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    shifted = np.zeros_like(edges)
                    ys = slice(max(dy, 0), h + min(dy, 0))
                    yd = slice(max(-dy, 0), h + min(-dy, 0))
                    xs = slice(max(dx, 0), w + min(dx, 0))
                    xd = slice(max(-dx, 0), w + min(-dx, 0))
                    shifted[yd, xd] = edges[ys, xs]
                    grown |= shifted
        new = edges | (weak & grown)
        if np.any(new != edges):
            changed = True
            edges = new
    return edges


def block_match_motion(prev: np.ndarray, curr: np.ndarray, block=16, radius=8) -> float:
    h, w = curr.shape
    hb, wb = (h // block) * block, (w // block) * block
    prev_p = np.pad(prev.astype(np.float64), radius, mode="edge")
    curr = curr.astype(np.float64)
    mags = []
    for by in range(0, hb, block):
        for bx in range(0, wb, block):
            cblk = curr[by : by + block, bx : bx + block]
            best = (np.inf, 0.0, 0.0)
            for dy in range(-radius, radius + 1):
                for dx in range(-radius, radius + 1):
                    pblk = prev_p[
                        by + radius + dy : by + radius + dy + block,
                        bx + radius + dx : bx + radius + dx + block,
                    ]
                    sad = np.sum(np.abs(cblk - pblk))
                    if sad < best[0]:
                        best = (sad, dy, dx)
            mags.append(np.hypot(best[1], best[2]))
    return float(np.mean(mags))


def down2_mean(x: np.ndarray) -> np.ndarray:
    h, w = (x.shape[0] // 2) * 2, (x.shape[1] // 2) * 2
    xc = x[:h, :w].astype(np.float64)
    return 0.25 * (xc[0::2, 0::2] + xc[0::2, 1::2] + xc[1::2, 0::2] + xc[1::2, 1::2])


def block_match_motion_pyramid(prev: np.ndarray, curr: np.ndarray, block=16, radius=8) -> float:
    """Coarse-level pyramid search: 2x2-mean downsample, exhaustive at
    block/2 and radius/2, magnitudes scaled by 2 (ops.motion semantics)."""
    return 2.0 * block_match_motion(
        down2_mean(prev), down2_mean(curr),
        block=max(block // 2, 1), radius=max(radius // 2, 1),
    )
