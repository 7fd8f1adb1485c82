"""Flagship entry point get_analyzer().analyze(path=...) — config overwrite
UX, PDF-path and transcript-path routing (analyzer/dd.py:60-121,
doctectionpipe.py:217-388 analogs)."""

from __future__ import annotations

import pytest


def test_config_overwrite_types_and_guard():
    from deepdoctection_ray.analyzer import get_analyzer

    a = get_analyzer(["USE_LANGUAGE_DETECTION=True", "CONCURRENCY=2", "PARAGRAPH_BREAK=0.05"])
    assert a.cfg["USE_LANGUAGE_DETECTION"] is True
    assert a.cfg["CONCURRENCY"] == 2
    assert a.cfg["PARAGRAPH_BREAK"] == 0.05
    with pytest.raises(KeyError, match="unknown config key"):
        get_analyzer(["NOT_A_KEY=1"])
    with pytest.raises(ValueError, match="KEY=value"):
        get_analyzer(["garbage"])


def test_analyze_pdf_directory(ray_session):
    from deepdoctection_ray import fixtures
    from deepdoctection_ray.analyzer import get_analyzer

    fixtures.ensure_fixtures()
    import os

    pdf_dir = os.path.join(fixtures.FIXTURE_DIR, "pdfs")
    out = get_analyzer().analyze(pdf_dir).to_pandas()
    assert {"file_name", "page_number", "extracted_text", "payload_kind"} <= set(out.columns)
    assert (out["payload_kind"] == "pdfish").all()
    assert len(out) > 40  # 40 docs, 1-3 pages each
    assert out["extracted_text"].str.len().gt(0).all()


def test_analyze_transcripts_with_language_stage(ray_session):
    from deepdoctection_ray import fixtures
    from deepdoctection_ray.analyzer import get_analyzer

    fixtures.ensure_fixtures()
    a = get_analyzer(["USE_LANGUAGE_DETECTION=True"])
    out = a.analyze(fixtures.TRANSCRIPTS_DIR).to_pandas()
    assert "lang_pred" in out.columns
    assert {"conv_id", "turn_idx", "extracted_text"} <= set(out.columns)


def test_deskew_flag_recovers_skewed_page(ray_session, tmp_path):
    """USE_DESKEW: a small-angle-rotated pdfish page extracts as garbled
    column-split text by default, but the deskewing path recovers the clean
    line order; the default path is untouched (reference parity)."""
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepdoctection_ray.analyzer import get_analyzer
    from deepdoctection_ray.kernels.transforms import rotate_boxes_by_degrees

    words, boxes = [], []
    lines = []
    for li in range(8):
        y = 40.0 + 28.0 * li
        x = 50.0
        row = []
        for wi in range(5):
            t = f"w{li}{wi}"
            w = 7.0 * len(t)
            boxes.append([x, y, x + w, y + 14.0])
            words.append(t)
            row.append(t)
            x += w + 8.0
        lines.append(" ".join(row))
    clean_text = "\n".join(lines)
    rot = rotate_boxes_by_degrees(np.array(boxes), 6.0, 600.0, 400.0)
    payload = json.dumps(
        {
            "page": {"width": 600, "height": 400},
            "words": [
                {"text": t, "x0": b[0], "top": b[1], "x1": b[2], "bottom": b[3]}
                for t, b in zip(words, rot)
            ],
        }
    )
    table = pa.table(
        {
            "conv_id": pa.array(["c"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array([payload], pa.string()),
            "tool": pa.array(["pdf_reader"], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    d = str(tmp_path / "skewed")
    import os

    os.makedirs(d)
    pq.write_table(table, os.path.join(d, "part.parquet"))

    plain = get_analyzer().analyze(d).to_pandas().iloc[0]["extracted_text"]
    deskewed = get_analyzer(["USE_DESKEW=True"]).analyze(d).to_pandas().iloc[0]["extracted_text"]
    assert deskewed == clean_text
    assert plain != clean_text  # skew genuinely breaks the default ordering
