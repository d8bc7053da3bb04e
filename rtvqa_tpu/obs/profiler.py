"""Tracing / profiling hooks (SURVEY.md §5 — the reference has only tqdm
progress bars and INFO logs; ``complexity_metrics.py:144``, ``:267-293``).

Provides:
* ``StageTimer`` — per-stage wall-clock accounting + frames/sec/chip counter
  (the BASELINE headline metric), emitted as structured logs or a dict;
* ``device_trace`` — context manager around ``jax.profiler`` traces for
  XProf/TensorBoard inspection of the fused metric programs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

from rtvqa_tpu.obs.logging import get_logger

logger = get_logger("rtvqa_tpu.profiler")


class StageTimer:
    """Accumulates wall time per named stage; supports nested use."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self.frames: int = 0

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def add_frames(self, n: int) -> None:
        self.frames += n

    def summary(self) -> dict:
        total = sum(self.totals.values())
        out = {
            "stages": {
                k: {"seconds": round(v, 4), "calls": self.counts[k]}
                for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
            },
            "total_seconds": round(total, 4),
            "frames": self.frames,
        }
        if total > 0 and self.frames:
            out["frames_per_sec"] = round(self.frames / total, 2)
        return out

    def log_summary(self) -> None:
        logger.info("profile: %s", self.summary())


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", log_dir)
