import csv

from rtvqa_tpu.pipeline.csv_sink import CSV_COLUMNS, read_rows, update_csv


def test_schema_is_reference_15_columns():
    # Exact column set + order from reference README.md:71.
    assert CSV_COLUMNS == [
        "Bitrate (kbps)",
        "Resolution (px)",
        "Frame Rate (fps)",
        "CRF",
        "PSNR",
        "SSIM",
        "VMAF",
        "Advanced Motion Complexity",
        "DCT Complexity",
        "Temporal DCT Complexity",
        "Histogram Complexity",
        "Edge Detection Complexity",
        "ORB Feature Complexity",
        "Color Histogram Complexity",
        "Framerate Variation",
    ]


def test_append_and_header_once(tmp_path):
    f = str(tmp_path / "out.csv")
    row = {c: i for i, c in enumerate(CSV_COLUMNS)}
    update_csv(row, f)
    update_csv(row, f)
    with open(f) as fh:
        lines = fh.read().strip().splitlines()
    assert len(lines) == 3  # header + 2 rows
    reader = csv.DictReader(lines)
    assert reader.fieldnames == CSV_COLUMNS


def test_missing_metrics_become_empty_cells(tmp_path):
    f = str(tmp_path / "out.csv")
    update_csv({"CRF": 23, "PSNR": 50.78}, f)
    rows = read_rows(f)
    assert rows[0]["CRF"] == "23"
    assert rows[0]["VMAF"] == ""


def test_extra_keys_ignored(tmp_path):
    f = str(tmp_path / "out.csv")
    update_csv({"CRF": 23, "internal_debug": "x"}, f)
    rows = read_rows(f)
    assert "internal_debug" not in rows[0]
