"""Emit our VMAF scores for the frozen parity pair (or any clip pair).

Companion to ``tests/test_vmaf_parity_hook.py`` (VERDICT r2 next #6): run
this with a real libvmaf model JSON to get per-frame + pooled scores, and
(with no ref/dis args) to materialize the frozen clip pair on disk so
libvmaf can be run on the SAME files on a machine that has it:

    python scripts/vmaf_parity.py vmaf_v0.6.1.json [ref.mp4 dis.mp4]

Then elsewhere:
    vmaf -r parity_ref.mp4 -d parity_dis.mp4 --json -o log.json \
        -m path=vmaf_v0.6.1.json
and back here:
    RTVQA_VMAF_MODEL=... RTVQA_VMAF_EXPECTED=log.json ./run_tests.sh \
        tests/test_vmaf_parity_hook.py
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    if len(sys.argv) not in (2, 4):
        print(__doc__)
        return 2
    model = sys.argv[1]
    if len(sys.argv) == 4:
        ref, dis = sys.argv[2], sys.argv[3]
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tests.test_vmaf_parity_hook import frozen_pair

        out_dir = os.path.abspath("vmaf_parity_clips")
        os.makedirs(out_dir, exist_ok=True)
        ref, dis = frozen_pair(out_dir)
        print(f"frozen pair written: {ref} {dis}")

    from rtvqa_tpu.metrics.full_reference import analyze_full_reference

    out = analyze_full_reference(ref, dis, vmaf_model_path=model)
    print(json.dumps({
        "model": out["vmaf_model"],
        "n_frames": out["n_frames"],
        "vmaf_mean": out["vmaf"],
        "vmaf_per_frame": [round(float(v), 5) for v in out["per_frame"]["vmaf"]],
        "psnr": out["psnr"],
        "ssim": out["ssim"],
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
