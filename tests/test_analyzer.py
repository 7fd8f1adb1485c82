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
