"""VMAF motion / motion2 features.

libvmaf's motion feature: blur each luma frame with the 5-tap FILTER_5
window (separably), then

  motion[t]  = mean |blur(y[t]) - blur(y[t-1])|      (0 for the first frame)
  motion2[t] = min(motion[t], mean |blur(y[t]) - blur(y[t+1])|)
               (motion2 of the last frame = motion[t])

motion2 is the feature the default VMAF model consumes
(``VMAF_feature_motion2_score``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rtvqa_tpu.vmaf.filters import filter1d_sep

FILTER_5 = np.array(
    [0.054488685, 0.244201342, 0.402619947, 0.244201342, 0.054488685],
    dtype=np.float64,
)


def motion_features(ref_y: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Per-frame motion/motion2 over (N, H, W) float luma (reference video's
    luma — VMAF's motion is computed on the *reference* only)."""
    blurred = filter1d_sep(ref_y.astype(jnp.float32), FILTER_5)
    diff = jnp.abs(blurred[1:] - blurred[:-1])
    sad = jnp.mean(diff, axis=(-2, -1))          # (N-1,)
    zero = jnp.zeros((1,), sad.dtype)
    motion = jnp.concatenate([zero, sad])         # motion[0] = 0
    fwd = jnp.concatenate([sad, jnp.full((1,), jnp.inf, sad.dtype)])
    motion2 = jnp.minimum(motion, fwd)            # last frame: min(m, inf) = m
    return {"motion": motion, "motion2": motion2}
