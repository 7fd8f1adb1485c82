"""Page view accessors over real extraction rows (view.py; reference
dd_core/datapoint/view.py Page.text/chunks/get_layout_context)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def extracted_rows(ray_session):
    from deepdoctection_ray import fixtures
    from deepdoctection_ray.analyzer import get_analyzer

    fixtures.ensure_fixtures()
    out = get_analyzer().analyze(fixtures.TRANSCRIPTS_DIR)
    return out.take(50)


def test_page_text_and_words_consistent(extracted_rows):
    from deepdoctection_ray.view import Page

    checked = 0
    for row in extracted_rows:
        page = Page.from_row(row)
        if not page.text:
            continue
        words = page.words()
        # every span slices a non-empty token out of the page text
        assert all(w for w in words)
        assert " ".join(words).replace("\n", " ") == page.text.replace("\n", " ")
        checked += 1
    assert checked > 10


def test_page_chunks_cover_blocks(extracted_rows):
    from deepdoctection_ray.view import Page

    for row in extracted_rows:
        page = Page.from_row(row)
        chunks = list(page.chunks())
        assert len(chunks) == len(page.blocks)
        for order, category, text in chunks:
            assert order >= 1 and isinstance(category, str)
        if len(chunks) > 1:
            ctx = page.get_layout_context(0, context=1)
            assert 0 in ctx and len(ctx) >= 2
            return
    pytest.skip("no multi-block row in sample")


def test_page_identity_mapping(extracted_rows):
    from deepdoctection_ray.view import Page

    page = Page.from_row(extracted_rows[0])
    assert page.document_id  # conv_id fallback
    assert page.page_number is not None  # turn_idx fallback
    assert page.error is None


def test_page_add_attribute_name():
    """view.py:1674-1696 analog: user-registered derived attributes."""
    import pytest

    from deepdoctection_ray.view import Page

    Page.add_attribute_name("n_words", lambda p: len(p.words()))
    try:
        p = Page({"extracted_text": "hello world", "spans": [
            {"start": 0, "end": 5, "block_idx": 0, "category": "text", "reading_order": 1},
            {"start": 6, "end": 11, "block_idx": 0, "category": "text", "reading_order": 2},
        ], "blocks": [{"category": "text", "reading_order": 1, "n_words": 2}]})
        assert p.n_words == 2
        assert p.get("extracted_text") == "hello world"
        with pytest.raises(ValueError, match="already exists"):
            Page.add_attribute_name("text", lambda p: None)
        with pytest.raises(AttributeError):
            _ = p.not_registered
    finally:
        Page.remove_attribute_name("n_words")
