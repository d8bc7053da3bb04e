"""Independent NumPy oracles for FFmpeg's psnr/ssim filter algorithms.

Written from the published libavfilter/x264 algorithm descriptions in plain
loop style (float64), independent of the JAX implementations under test.
"""

from __future__ import annotations

import numpy as np

SSIM_C1 = int(0.01 * 0.01 * 255 * 255 * 64 + 0.5)
SSIM_C2 = int(0.03 * 0.03 * 255 * 255 * 64 * 63 + 0.5)


def psnr_frame(ref_planes, dis_planes) -> dict:
    sse_total = 0.0
    n_total = 0
    out = {}
    for name, r, d in zip("yuv", ref_planes, dis_planes):
        diff = r.astype(np.float64) - d.astype(np.float64)
        sse = float(np.sum(diff * diff))
        out[f"mse_{name}"] = sse / r.size
        sse_total += sse
        n_total += r.size
    out["mse_avg"] = sse_total / n_total
    return out


def ssim_end1(s1, s2, ss, s12) -> float:
    vars_ = ss * 64 - s1 * s1 - s2 * s2
    covar = s12 * 64 - s1 * s2
    return ((2 * s1 * s2 + SSIM_C1) * (2 * covar + SSIM_C2)) / (
        (s1 * s1 + s2 * s2 + SSIM_C1) * (vars_ + SSIM_C2)
    )


def ssim_plane(ref: np.ndarray, dis: np.ndarray) -> float:
    h, w = ref.shape
    bh, bw = h // 4, w // 4
    r = ref.astype(np.int64)
    d = dis.astype(np.int64)
    s1 = np.zeros((bh, bw), np.int64)
    s2 = np.zeros((bh, bw), np.int64)
    ss = np.zeros((bh, bw), np.int64)
    s12 = np.zeros((bh, bw), np.int64)
    for i in range(bh):
        for j in range(bw):
            rb = r[i * 4 : i * 4 + 4, j * 4 : j * 4 + 4]
            db = d[i * 4 : i * 4 + 4, j * 4 : j * 4 + 4]
            s1[i, j] = rb.sum()
            s2[i, j] = db.sum()
            ss[i, j] = (rb * rb).sum() + (db * db).sum()
            s12[i, j] = (rb * db).sum()
    total = 0.0
    for i in range(bh - 1):
        for j in range(bw - 1):
            total += ssim_end1(
                s1[i, j] + s1[i, j + 1] + s1[i + 1, j] + s1[i + 1, j + 1],
                s2[i, j] + s2[i, j + 1] + s2[i + 1, j] + s2[i + 1, j + 1],
                ss[i, j] + ss[i, j + 1] + ss[i + 1, j] + ss[i + 1, j + 1],
                s12[i, j] + s12[i, j + 1] + s12[i + 1, j] + s12[i + 1, j + 1],
            )
    return total / ((bh - 1) * (bw - 1))


def ssim_frame(ref_planes, dis_planes) -> dict:
    sy = ssim_plane(ref_planes[0], dis_planes[0])
    su = ssim_plane(ref_planes[1], dis_planes[1])
    sv = ssim_plane(ref_planes[2], dis_planes[2])
    n_y = ref_planes[0].size
    n_c = ref_planes[1].size
    return {
        "ssim_y": sy,
        "ssim_u": su,
        "ssim_v": sv,
        "ssim_all": (sy * n_y + su * n_c + sv * n_c) / (n_y + 2 * n_c),
    }
