"""Generate the real-content 1080p feature goldens (VERDICT r3 next #4).

Builds the deterministic encoded clip pair (tests/real_content.py), runs the
production full-reference engine, and freezes the per-frame VIF x4 / ADM2 /
motion2 / PSNR / SSIM series plus the decoded-luma digests to
tests/golden/real_1080p_features.npz. tests/test_golden_vectors.py asserts
future runs match to <= 1e-5, so any kernel/convention change that would
move VMAF features on real codec content fails loudly.

Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/freeze_real_goldens.py
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests import real_content  # noqa: E402


def main() -> int:
    with tempfile.TemporaryDirectory(prefix="rtvqa_golden_") as d:
        ref, dis = real_content.build_pair(d)
        feats = real_content.compute_features(ref, dis)
        digests = {
            "digest_ref": real_content.decoded_luma_digest(ref),
            "digest_dis": real_content.decoded_luma_digest(dis),
        }
    os.makedirs(os.path.dirname(real_content.GOLDEN_PATH), exist_ok=True)
    np.savez(real_content.GOLDEN_PATH, **feats,
             **{k: np.array(v) for k, v in digests.items()})
    print(f"wrote {real_content.GOLDEN_PATH}")
    for k in real_content.FEATURE_KEYS:
        v = feats[k]
        print(f"  {k}: first={v[0]:.6f} mean={np.mean(v[np.isfinite(v)]):.6f}")
    print(f"  {digests}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
