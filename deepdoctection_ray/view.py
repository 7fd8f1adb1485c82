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

    # ``Page.add_attribute_name`` analog (``view.py:1674-1696``): user-defined
    # derived attributes, registered once per process, resolved on attribute
    # access. In the flat-row world every output COLUMN is already an
    # attribute (``page.get(col)``); this registry covers COMPUTED views.
    _custom_attributes: dict[str, Any] = {}

    def __init__(self, row: dict[str, Any]) -> None:
        self._row = row

    @classmethod
    def from_row(cls, row: dict[str, Any]) -> "Page":
        return cls(row)

    @classmethod
    def add_attribute_name(cls, name: str, fn) -> None:
        """Register a derived attribute: ``fn(page) -> value``, exposed as
        ``page.<name>``. Raises on collision with a built-in accessor."""
        if hasattr(cls, name):
            raise ValueError(f"attribute {name!r} already exists on Page")
        cls._custom_attributes[name] = fn

    @classmethod
    def remove_attribute_name(cls, name: str) -> None:
        cls._custom_attributes.pop(name, None)

    def get(self, column: str, default: Any = None) -> Any:
        """Raw column access — every output column is a Page attribute."""
        return self._row.get(column, default)

    def __getattr__(self, name: str) -> Any:
        # only called when normal lookup fails; resolve registered attributes
        fns = type(self)._custom_attributes
        if name in fns:
            return fns[name](self)
        raise AttributeError(name)

    # ------------------------------------------------------------ identity

    @property
    def document_id(self) -> str | None:
        return (
            self._row.get("document_id")
            or self._row.get("doc_id")
            or self._row.get("conv_id")
        )

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

    def get_entities(self) -> list[dict]:
        """``Page.get_entities`` (``view.py:1756-1784``): reading-ordered
        entity tokens as ``{word, entity, annotation_id,
        successor_annotation_id}`` dicts, OTHER-class tokens dropped.
        Requires the ``token_classes`` column the
        :class:`stages.classify.TokenClassifier` stage adds."""
        from .kernels.entities import entities_of_row

        classes = self._row.get("token_classes")
        if classes is None:
            raise KeyError(
                "row has no token_classes — run the TokenClassifier stage first"
            )
        return entities_of_row(
            str(self.document_id),
            self.text,
            self._row.get("spans") or [],
            list(classes),
        )

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"Page(document_id={self.document_id!r}, page_number={self.page_number}, "
            f"kind={self.payload_kind!r}, blocks={len(self.blocks)})"
        )


class TableView:
    """Typed accessor over one segmented table — the ``Table`` view analog
    (``dd_core/datapoint/view.py:616-760``), over flat cell records instead
    of the annotation graph.

    ``cells``: list of dicts ``{row, col, row_span, col_span, text,
    is_header}`` — the output shape of the segmentation kernels
    (``kernels/table_segment.py`` / ``kernels/pubtables.py``) plus a header
    flag (the ``CellLabel.COLUMN_HEADER`` sub-category analog; defaults to
    "covers grid row 1" when absent, PubTables' usual convention).
    """

    def __init__(self, cells: list[dict]) -> None:
        self._cells = [
            {
                "row": int(c["row"]),
                "col": int(c["col"]),
                "row_span": int(c.get("row_span", 1)),
                "col_span": int(c.get("col_span", 1)),
                "text": c.get("text", ""),
                "is_header": bool(c.get("is_header", int(c["row"]) == 1)),
            }
            for c in cells
        ]

    @property
    def cells(self) -> list[dict]:
        return list(self._cells)

    @property
    def number_of_rows(self) -> int:
        return max((c["row"] + c["row_span"] - 1 for c in self._cells), default=0)

    @property
    def number_of_columns(self) -> int:
        return max((c["col"] + c["col_span"] - 1 for c in self._cells), default=0)

    def row(self, row_number: int) -> list[dict]:
        """Cells whose row range covers ``row_number`` (``view.py:747-760``),
        sorted by column."""
        hits = [
            c
            for c in self._cells
            if c["row"] <= row_number <= c["row"] + c["row_span"] - 1
        ]
        return sorted(hits, key=lambda c: c["col"])

    @property
    def column_header_cells(self) -> list[dict]:
        """Header-flagged cells sorted by column (``view.py:643-658``)."""
        return sorted(
            (c for c in self._cells if c["is_header"]), key=lambda c: c["col"]
        )

    def kv_header_rows(self, row_number: int) -> dict[str, str]:
        """``Table.kv_header_rows`` (``view.py:678-728``): for the given row,
        map ``str((header_col, header_text))`` → cell text, a cell matching
        every header whose column span covers the cell's column."""
        kv: dict[str, str] = {}
        headers = self.column_header_cells
        for cell in self.row(row_number):
            for header in headers:
                if header["col"] <= cell["col"] <= header["col"] + header["col_span"] - 1:
                    kv[str((header["col"], header["text"]))] = cell["text"]
        return kv
