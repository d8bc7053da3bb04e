"""Multi-chip full-reference quality analysis (PSNR/SSIM/VMAF) for one clip
pair, frames sharded over the mesh's "frame" axis.

The reference buys these metrics from one single-process ffmpeg invocation
(``video_processing.py:270-297``). The single-device TPU equivalent streams
chunks through two fused programs (``metrics.full_reference``); this module
is the multi-chip variant used by the batched corpus sweep
(``pipeline.sweep.run_sweep_sharded``): both clips are decoded once, the
frame axis is padded to the mesh and sharded, and one
``parallel.sharding.sharded_quality_step`` call computes every per-frame
quantity (PSNR plane MSEs, x264 SSIM, VIF x4, ADM2, blurred-luma motion SADs
with a one-frame ``ppermute`` halo). Pooling is shared byte-for-byte with the
streaming engine via ``metrics.full_reference.pool_full_reference``.

Memory note: the whole clip pair is resident across the mesh (N/n_devices
full-res frames per device) — the corpus-sweep mode, not the unbounded-length
streaming mode.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from rtvqa_tpu.io import video as vio
from rtvqa_tpu.metrics.full_reference import CHUNK_KEYS, pool_full_reference
from rtvqa_tpu.obs.logging import get_logger

logger = get_logger("rtvqa_tpu.quality_sharded")


def analyze_full_reference_sharded(
    ref_path: str,
    dis_path: str,
    mesh=None,
    vmaf_model_path: Optional[str] = None,
    n_devices: Optional[int] = None,
) -> dict:
    """Full-reference metrics with the frame axis sharded over ``mesh``.

    Returns the same dict as ``metrics.full_reference.analyze_full_reference``.
    """
    import jax

    from rtvqa_tpu.parallel.sharding import make_mesh, sharded_quality_step

    if mesh is None:
        devs = jax.devices()
        if n_devices:
            devs = devs[:n_devices]
        mesh = make_mesh(n_clip=1, n_frame=len(devs), devices=devs)

    ref = vio.decode_sampled(ref_path, 1)
    dis = vio.decode_sampled(dis_path, 1)
    n = min(ref.y.shape[0], dis.y.shape[0])  # common prefix, like streaming
    if n == 0:
        return {"n_frames": 0}
    if (ref.height, ref.width) != (dis.height, dis.width):
        raise ValueError(
            f"resolution mismatch: {ref.width}x{ref.height} vs {dis.width}x{dis.height}"
        )

    n_frame_shards = mesh.devices.shape[-1]
    n_pad = -(-n // n_frame_shards) * n_frame_shards

    def prep(a):
        a = a[:n]
        if n_pad > n:
            a = np.concatenate([a, np.repeat(a[-1:], n_pad - n, 0)], 0)
        return a

    from rtvqa_tpu.vmaf.model import load_model

    model = load_model(vmaf_model_path) if vmaf_model_path else None
    fn = sharded_quality_step(
        mesh,
        vif_egl=model.vif_enhn_gain_limit if model else None,
        adm_egl=model.adm_enhn_gain_limit if model else None,
    )
    packed = np.asarray(
        fn(prep(ref.y), prep(ref.u), prep(ref.v),
           prep(dis.y), prep(dis.u), prep(dis.v))
    )
    s = {k: packed[i, :n] for i, k in enumerate(CHUNK_KEYS)}
    s["motion_sad"] = s["motion_sad"].copy()
    s["motion_sad"][0] = 0.0  # global first frame has no predecessor
    return pool_full_reference(s, n, vmaf_model_path, model=model)
