"""Multi-clip CRF-ladder sweep with resumable manifest.

The reference is single-shot (one clip, one CRF per invocation); BASELINE.json
configs[4] calls for a batched CRF ladder (18/23/28/33) over a corpus. This
driver:

* enumerates (clip, crf) work items;
* skips items already recorded in the manifest (interrupted sweeps resume by
  skipping done rows — SURVEY.md §5 checkpoint/resume; CSV appends stay
  idempotent);
* isolates failures per item (one bad clip ≠ failed sweep — SURVEY.md §5
  failure-detection row).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Iterable, Optional, Sequence

from rtvqa_tpu.config import Config
from rtvqa_tpu.obs.logging import get_logger

logger = get_logger("rtvqa_tpu.sweep")

DEFAULT_CRF_LADDER = (18, 23, 28, 33)


@dataclasses.dataclass
class SweepManifest:
    """Append-only JSONL manifest keyed by (video, crf)."""

    path: str

    def done_keys(self) -> set[tuple[str, int]]:
        keys = set()
        if os.path.isfile(self.path):
            with open(self.path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if rec.get("status") == "done":
                        keys.add((rec["video"], int(rec["crf"])))
        return keys

    def record(self, video: str, crf: int, status: str, error: Optional[str] = None) -> None:
        rec = {"video": video, "crf": crf, "status": status}
        if error:
            rec["error"] = error
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def run_sweep(
    videos: Sequence[str],
    config: Config,
    crf_ladder: Iterable[int] = DEFAULT_CRF_LADDER,
    manifest_path: Optional[str] = None,
) -> dict[str, int]:
    """Analyze every (video, crf) pair; returns {'done': n, 'failed': m, 'skipped': k}."""
    from rtvqa_tpu.pipeline.analyzer import process_video_and_extract_metrics

    manifest = SweepManifest(manifest_path or config.csv_file + ".manifest.jsonl")
    done = manifest.done_keys()
    stats = {"done": 0, "failed": 0, "skipped": 0}

    for video in videos:
        for crf in crf_ladder:
            if (video, int(crf)) in done:
                stats["skipped"] += 1
                continue
            cfg = dataclasses.replace(config, crf=int(crf))
            try:
                process_video_and_extract_metrics(video, cfg)
                manifest.record(video, int(crf), "done")
                stats["done"] += 1
            except Exception as e:  # per-item isolation
                logger.error("Sweep item (%s, crf=%d) failed: %s", video, crf, e)
                manifest.record(video, int(crf), "failed", error=str(e))
                stats["failed"] += 1
    return stats
