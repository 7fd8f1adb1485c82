"""Row-level view classes — the consumption surface of extraction output.

The reference wraps its ``Image`` IR in ``Page`` (``dd_core/datapoint/
view.py``: ``Page.text`` :1169, ``Page.chunks`` :1184-1222, ``Page.tables``,
``Page.get_layout_context`` :1123-1160) so users read results through typed
accessors instead of raw annotations. Here the extraction output is a FLAT
Arrow row — this module gives it the same ergonomic face:

    for row in ds.iter_rows():
        page = Page.from_row(row)
        page.text, page.chunks(), page.spans, page.blocks

``Page`` is a zero-copy wrapper over the row dict; nothing is recomputed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterator


@dataclass(frozen=True)
class Span:
    """One word span of the extracted text (``view.py`` Word analog)."""

    start: int
    end: int
    block_idx: int
    category: str
    reading_order: int

    def text_of(self, text: str) -> str:
        return text[self.start : self.end]


class Page:
    """Typed accessor over one extraction-output row."""

    def __init__(self, row: dict[str, Any]) -> None:
        self._row = row

    @classmethod
    def from_row(cls, row: dict[str, Any]) -> "Page":
        return cls(row)

    # ------------------------------------------------------------ identity

    @property
    def document_id(self) -> str | None:
        return self._row.get("document_id") or self._row.get("conv_id")

    @property
    def page_number(self) -> int | None:
        v = self._row.get("page_number")
        return self._row.get("turn_idx") if v is None else v

    @property
    def payload_kind(self) -> str:
        return self._row.get("payload_kind", "plain")

    @property
    def error(self) -> str | None:
        return self._row.get("error")

    # ------------------------------------------------------------- content

    @property
    def text(self) -> str:
        """``Page.text`` (``view.py:1169``): the reading-ordered text."""
        return self._row.get("extracted_text", "") or ""

    @property
    def spans(self) -> list[Span]:
        return [Span(**s) for s in (self._row.get("spans") or [])]

    @property
    def blocks(self) -> list[dict]:
        """Ordered block summaries (category, reading_order, n_words)."""
        return list(self._row.get("blocks") or [])

    def words(self) -> list[str]:
        text = self.text
        return [s.text_of(text) for s in self.spans]

    def chunks(self) -> Iterator[tuple[int, str, str]]:
        """``Page.chunks`` (``view.py:1184-1222``): (reading_order, category,
        chunk_text) per block, in reading order."""
        text = self.text
        by_block: dict[int, list[Span]] = {}
        for s in self.spans:
            by_block.setdefault(s.block_idx, []).append(s)
        for b_idx, block in enumerate(self.blocks):
            spans = sorted(by_block.get(b_idx, []), key=lambda s: s.reading_order)
            chunk = " ".join(s.text_of(text) for s in spans)
            yield (block["reading_order"], block["category"], chunk)

    def get_layout_context(self, block_idx: int, context: int = 1) -> list[int]:
        """``Page.get_layout_context`` (``view.py:1123-1160``): the block
        indices within ±context reading-order positions of the given block."""
        blocks = self.blocks
        if not (0 <= block_idx < len(blocks)):
            raise IndexError(f"block_idx {block_idx} out of range ({len(blocks)} blocks)")
        order = blocks[block_idx]["reading_order"]
        return [
            i
            for i, b in enumerate(blocks)
            if abs(b["reading_order"] - order) <= context
        ]

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"Page(document_id={self.document_id!r}, page_number={self.page_number}, "
            f"kind={self.payload_kind!r}, blocks={len(self.blocks)})"
        )
