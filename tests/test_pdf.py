"""Pure-Python PDF container parser: writer→reader round trips, page split,
filter paths, error surfaces (kernels/pdf.py; reference semantics
extern/pdftext.py:50-135, dd_core/utils/pdf_utils.py:406-545)."""

from __future__ import annotations

from struct import error as struct_error

import pytest

from deepdoctection_ray.kernels.pdf import PdfError, PdfReader, write_pdf

PAGES = [
    {"width": 600, "height": 400, "words": [("hello", 50, 350, 12), ("world", 95, 350, 12)]},
    {"width": 300, "height": 200, "words": [("page", 30, 150, 10)]},
]


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_words_and_sizes(compress):
    reader = PdfReader(write_pdf(PAGES, compress=compress))
    assert reader.num_pages == 2
    assert reader.page_size(0) == (600.0, 400.0)
    assert reader.page_size(1) == (300.0, 200.0)
    words = reader.page_words(0)
    assert [w["text"] for w in words] == ["hello", "world"]
    # pdfplumber top-left convention: top = height - y - size
    assert words[0]["top"] == 400 - 350 - 12
    assert words[0]["bottom"] == 400 - 350


def test_single_page_resplit_is_standalone():
    reader = PdfReader(write_pdf(PAGES, compress=True))
    single = reader.page_pdf_bytes(1)
    sub = PdfReader(single)
    assert sub.num_pages == 1
    assert [w["text"] for w in sub.page_words(0)] == ["page"]


def test_escaped_strings_and_tj_array():
    content = b"BT /F1 12 Tf 1 0 0 1 50 100 Tm [(a\\(b) -500 (c)] TJ ET"
    data = write_pdf([{"width": 200, "height": 200, "raw_content": content}])
    words = PdfReader(data).page_words(0)
    assert [w["text"] for w in words] == ["a(b", "c"]
    # kerning -500/1000 * 12 = -6 shifts x0 right by advance minus 6
    assert words[1]["x0"] == pytest.approx(words[0]["x1"] + 6.0)


def test_td_and_tstar_line_movement():
    content = b"BT /F1 10 Tf 10 20 Td (one) Tj 0 -15 TD (two) Tj T* (three) Tj ET"
    data = write_pdf([{"width": 200, "height": 200, "raw_content": content}])
    words = PdfReader(data).page_words(0)
    assert [w["text"] for w in words] == ["one", "two", "three"]
    assert words[1]["bottom"] - words[0]["bottom"] == 15.0
    assert words[2]["bottom"] - words[1]["bottom"] == 15.0  # T* reuses TD leading


def test_rejects_non_pdf_and_names_missing_feature():
    with pytest.raises(PdfError, match="missing %PDF header"):
        PdfReader(b"plain text")


def test_split_pdf_pages_real_pdf():
    from deepdoctection_ray.sources import split_pdf_pages

    data = write_pdf(PAGES)
    rows = split_pdf_pages({"bytes": data, "path": "/x/doc.pdf"})
    assert [r["page_number"] for r in rows] == [0, 1]
    assert all(r["pdf_bytes"].startswith(b"%PDF") for r in rows)
    assert '"words"' in rows[0]["text"]
    # legacy synthetic container still splits
    legacy = split_pdf_pages({"bytes": b"a%PAGE%b", "path": "/x/s.bin"})
    assert [r["pdf_bytes"] for r in legacy] == [b"a", b"b"]


def test_pdf_reader_fuzz_never_crashes_unexpectedly():
    """Poison-input robustness: arbitrary byte mutations of a valid PDF either
    parse or raise a controlled error type — never hang or corrupt."""
    from hypothesis import given, settings, strategies as st

    base = write_pdf(PAGES)

    @settings(max_examples=150, deadline=2000)
    @given(
        pos=st.integers(min_value=0, max_value=len(base) - 1),
        chunk=st.binary(min_size=1, max_size=64),
    )
    def mutate(pos, chunk):
        data = base[:pos] + chunk + base[pos + len(chunk):]
        try:
            reader = PdfReader(data)
            for i in range(reader.num_pages):
                reader.page_words(i)
        except (PdfError, ValueError, KeyError, IndexError, struct_error, EOFError, OverflowError, MemoryError, TypeError, AttributeError) as _:
            pass  # controlled failure classes
        except Exception as exc:  # noqa: BLE001
            import zlib
            if isinstance(exc, zlib.error):
                return
            raise AssertionError(f"unexpected {type(exc).__name__}: {exc}") from exc

    mutate()

