import logging
import threading

import numpy as np

from rtvqa_tpu.obs.profiler import StageTimer
from rtvqa_tpu.pipeline.csv_sink import CSV_COLUMNS, read_rows, update_csv


def test_stage_timer_summary():
    t = StageTimer()
    with t.stage("decode"):
        pass
    with t.stage("compute"):
        with t.stage("decode"):
            pass
    t.add_frames(120)
    s = t.summary()
    assert s["stages"]["decode"]["calls"] == 2
    assert s["frames"] == 120
    assert "frames_per_sec" in s


def test_csv_sink_thread_safety(tmp_path):
    # SURVEY.md §5 race-detection row: the CSV sink is the only shared
    # mutable state; hammer it from 8 threads.
    f = str(tmp_path / "hammer.csv")
    n_threads, per_thread = 8, 25

    def worker(tid):
        for i in range(per_thread):
            update_csv({"CRF": tid * 1000 + i}, f)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    rows = read_rows(f)
    assert len(rows) == n_threads * per_thread
    values = sorted(int(r["CRF"]) for r in rows)
    expected = sorted(t * 1000 + i for t in range(n_threads) for i in range(per_thread))
    assert values == expected  # no torn/interleaved writes


def test_logging_setup_rotating(tmp_path):
    from rtvqa_tpu.obs import logging as olog

    olog.stop_logging()
    log_file = str(tmp_path / "test.log")
    olog.setup_logging(log_file=log_file)
    lg = olog.get_logger("rtvqa_tpu.test")
    lg.info("hello from the queue")
    olog.stop_logging()
    assert "hello from the queue" in open(log_file).read()


def test_filter1d_matches_numpy(rng):
    from rtvqa_tpu.vmaf.filters import (
        filter1d_sep,
        filter1d_sep_axis,
        filter1d_sep_axis_np,
        filter1d_sep_np,
        gaussian_kernel,
    )

    x = rng.normal(size=(2, 24, 40)).astype(np.float32)
    taps = gaussian_kernel(9, 1.8)
    np.testing.assert_allclose(
        np.asarray(filter1d_sep(x, taps)), filter1d_sep_np(x, taps), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(filter1d_sep_axis(x, taps, -2)),
        filter1d_sep_axis_np(x, taps, -2),
        atol=1e-4,
    )


def test_filter_constant_preserved():
    from rtvqa_tpu.vmaf.filters import filter1d_sep, gaussian_kernel

    x = np.full((1, 16, 16), 7.0, np.float32)
    got = np.asarray(filter1d_sep(x, gaussian_kernel(17, 3.4)))
    np.testing.assert_allclose(got, 7.0, atol=1e-4)
