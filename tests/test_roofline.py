"""Sanity checks for the analytic roofline accounting (VERDICT r4 next #5).

These guard the published BENCH_r*.json "roofline" block: byte counts must
track the closed-form input sizes, and the measured-percentage helper must
produce fractions of peak in (0, 100] for realistic timings.
"""

import pytest

from rtvqa_tpu.obs.roofline import (
    attach_measured,
    complexity_roofline,
    quality_roofline,
)


def test_quality_bytes_scale_with_pixels():
    q1080 = quality_roofline(1080, 1920)
    q4k = quality_roofline(2160, 3840)
    for k in ("bytes_per_frame", "mxu_flops_per_frame"):
        assert q4k[k] == pytest.approx(4 * q1080[k], rel=1e-6)
    # Compulsory input floor: the raw yuv420 pair alone is 3*h*w bytes.
    assert q1080["bytes_per_frame"] >= 3 * 1080 * 1920


def test_complexity_counts_positive_and_sad_dominated():
    c = complexity_roofline(1080, 1920)
    assert c["bytes_per_frame"] > 1.5 * 1080 * 1920
    # The 81-candidate half-res SAD dominates the VPU estimate.
    assert c["vpu_ops_per_frame_est"] > (1080 * 1920 / 4) * 81


def test_attach_measured_percentages():
    q = attach_measured(quality_roofline(1080, 1920), 0.95e-3)
    assert 0 < q["pct_hbm_roofline"] < 100
    assert 0 < q["pct_mxu_roofline"] < 100
    assert q["seconds_per_frame"] == 0.95e-3
    # The documented conclusion: the phase is NOT HBM- or MXU-bound.
    assert q["pct_hbm_roofline"] < 15
    assert q["pct_mxu_roofline"] < 5
