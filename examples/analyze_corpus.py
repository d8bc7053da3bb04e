"""Example: batched CRF-ladder sweep over a corpus (BASELINE.json configs[4]).

Generates a small synthetic corpus with the framework's own encoder, then:

1. runs the resumable device-parallel CRF-ladder sweep (one CSV row per
   (clip, crf), quality sharded over the frame axis, complexity batched over
   all items, failures isolated, interrupted runs resume via the manifest);
2. runs the device-parallel complexity analysis over the whole corpus at once
   (clips data-parallel, each clip's frame axis sequence-parallel across the
   mesh — on a single chip this degrades to one device gracefully).

Usage:  PYTHONPATH=. python examples/analyze_corpus.py [workdir]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile
from fractions import Fraction

import numpy as np

from rtvqa_tpu.config import Config
from rtvqa_tpu.io import video as vio
from rtvqa_tpu.obs.profiler import StageTimer
from rtvqa_tpu.pipeline.batch_analyzer import analyze_clips_sharded
from rtvqa_tpu.pipeline.sweep import run_sweep_sharded


def make_corpus(workdir: str, n_clips: int = 3, frames: int = 48) -> list[str]:
    rng = np.random.default_rng(0)
    paths = []
    for c in range(n_clips):
        h, w = 144, 192
        yy, xx = np.mgrid[0:h, 0:w]
        clip = []
        for i in range(frames):
            g = np.clip(
                ((xx * (2 + c) + yy + (3 + c) * i) % 256)
                + rng.integers(0, 16, (h, w)),
                0, 255,
            ).astype(np.uint8)
            clip.append(np.stack([g, 255 - g, (g.astype(np.int16) + 64) % 256], -1).astype(np.uint8))
        path = f"{workdir}/clip{c}.mp4"
        vio.encode_raw_rgb(path, np.stack(clip), fps=Fraction(30, 1), crf=18)
        paths.append(path)
    return paths


def main() -> int:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="rtvqa_corpus_")
    os.makedirs(workdir, exist_ok=True)
    timer = StageTimer()

    with timer.stage("make_corpus"):
        corpus = make_corpus(workdir)
    print(f"corpus: {corpus}")

    cfg = Config(
        crf=23, resize_width=64, resize_height=64, frame_interval=4,
        csv_file=f"{workdir}/corpus.csv",
    )

    # The integrated device-parallel sweep: quality sharded over the frame
    # axis, complexity batched over (clip x crf) items on a clip x frame mesh.
    with timer.stage("crf_ladder_sweep_sharded"):
        stats = run_sweep_sharded(corpus, cfg, crf_ladder=(23, 33),
                                  manifest_path=f"{workdir}/manifest.jsonl")
    print(f"sweep: {stats}  (rerun me: already-done items are skipped)")

    with timer.stage("sharded_batch_analysis"):
        results = analyze_clips_sharded(
            corpus, resize_width=64, resize_height=64, frame_interval=4
        )
    for path, res in zip(corpus, results):
        print(json.dumps({"clip": path, **dataclasses.asdict(res)}))

    timer.log_summary()
    print(json.dumps(timer.summary(), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
