"""Naive NumPy oracle for the FAST-9/16 corner stage (loops, no vectorization)."""

from __future__ import annotations

import numpy as np

CIRCLE16 = [
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
]


def fast_score(gray: np.ndarray, threshold: float = 20.0) -> np.ndarray:
    h, w = gray.shape
    g = gray.astype(np.float64)
    score = np.zeros((h, w))
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            center = g[y, x]
            ring = np.array([g[y + dy, x + dx] for dy, dx in CIRCLE16])
            bright = ring - center
            dark = center - ring
            best = -np.inf
            for diffs in (bright, dark):
                for start in range(16):
                    arc = [diffs[(start + k) % 16] for k in range(9)]
                    best = max(best, min(arc))
            if best > threshold:
                score[y, x] = best
    return score


def fast_keypoint_count(
    gray: np.ndarray, threshold: float = 20.0, edge_threshold: int = 31
) -> int:
    score = fast_score(gray, threshold)
    h, w = gray.shape
    count = 0
    for y in range(h):
        for x in range(w):
            s = score[y, x]
            if s <= 0:
                continue
            if not (
                edge_threshold <= y < h - edge_threshold
                and edge_threshold <= x < w - edge_threshold
            ):
                continue
            neighbors = [
                score[y + dy, x + dx]
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
                if (dy or dx) and 0 <= y + dy < h and 0 <= x + dx < w
            ]
            if s > max(neighbors):
                count += 1
    return count
