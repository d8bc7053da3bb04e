"""CLI entry point — same UX as the reference (``README.md:58-60``):

    python -m rtvqa_tpu.cli <config.json> <input_video>
    rtvqa <config.json> <input_video>

(reference: ``video_processing.py:300-321``).
"""

from __future__ import annotations

import argparse
import sys

from rtvqa_tpu.config import load_config
from rtvqa_tpu.obs.logging import get_logger, setup_logging, stop_logging


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        description="Process a video, extract metrics, and update CSV."
    )
    parser.add_argument("config_file", type=str, help="Path to the configuration JSON file.")
    parser.add_argument("input_video", type=str, help="Path to the input video file.")
    parser.add_argument(
        "--sweep",
        type=int,
        nargs="*",
        default=None,
        metavar="CRF",
        help="Run a CRF-ladder sweep over these CRF values instead of the single configured CRF.",
    )
    parser.add_argument(
        "--trace",
        type=str,
        default=None,
        metavar="DIR",
        help="Write a jax.profiler device trace (XProf/TensorBoard) of the run to DIR.",
    )
    args = parser.parse_args(argv)

    setup_logging()
    logger = get_logger("rtvqa_tpu.cli")
    config = load_config(args.config_file)

    from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from rtvqa_tpu.obs.profiler import StageTimer, device_trace

    timer = StageTimer()
    try:
        with device_trace(args.trace):
            if args.sweep:
                from rtvqa_tpu.pipeline.sweep import run_sweep

                run_sweep([args.input_video], config, crf_ladder=args.sweep)
            else:
                from rtvqa_tpu.pipeline.analyzer import (
                    process_video_and_extract_metrics,
                )

                process_video_and_extract_metrics(args.input_video, config, timer=timer)
        if timer.totals:
            timer.log_summary()
        logger.info("Processing completed successfully.")
        return 0
    except Exception as e:
        logger.error("An error occurred during processing: %s", e)
        raise
    finally:
        stop_logging()


if __name__ == "__main__":
    sys.exit(main())
