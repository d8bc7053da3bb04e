"""Persistent XLA compilation cache.

First compilation of the fused metric programs is expensive (tens of seconds
on-chip; minutes through a remote-compile tunnel). Enabling JAX's persistent
cache makes every subsequent process reuse compiled executables — essential
for the CLI's one-process-per-clip usage pattern (the reference pays its
startup cost in process-pool spawning instead; ours is a one-time compile).
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "RTVQA_JAX_CACHE", os.path.expanduser("~/.cache/rtvqa_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax versions: fall through silently
