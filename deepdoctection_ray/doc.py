"""Multi-page ``Document`` container — ``dd_core/doc.py:148`` analog.

The reference's ``Document`` manages a multi-page PDF / image collection:
lazy 1-based page access, document-level summary, JSON round-trip. Here a
document is the per-file grouping of flat page rows (the extraction
output), so the container is a zero-copy view over those rows plus the
same ergonomics:

    pages = ds.filter(...)                      # rows of one file
    doc = Document.from_rows("report.pdf", pages.take_all())
    for page in doc:            # 1-based, sorted by page_number
        page.text
    doc.text                    # pages joined in order
    Document.from_json(doc.to_json())           # round trip

Grouping a whole Dataset into documents uses the engine's bucketed groupby
(one vectorized call per hash bucket — no per-document Ray task), mirroring
``assemble_conversations``.
"""

from __future__ import annotations

import json
from typing import Iterator

from .kernels.ids import md5_hex
from .view import Page


class Document:
    """Ordered page rows of one document, with reference-shaped accessors."""

    def __init__(self, file_name: str, rows: list[dict], document_id: str | None = None) -> None:
        self.file_name = file_name
        self._rows = sorted(rows, key=lambda r: r.get("page_number", r.get("turn_idx", 0)) or 0)
        self.document_id = document_id or md5_hex(file_name)

    # ------------------------------------------------------------ construction

    @classmethod
    def from_rows(cls, file_name: str, rows: list[dict], document_id: str | None = None) -> "Document":
        return cls(file_name, list(rows), document_id)

    # ---------------------------------------------------------------- pages

    @property
    def number_of_pages(self) -> int:
        return len(self._rows)

    def page(self, page_number: int) -> Page:
        """1-based page access (the reference's convention, ``doc.py:148``)."""
        if not 1 <= page_number <= len(self._rows):
            raise IndexError(
                f"page {page_number} out of range (document has {len(self._rows)} pages)"
            )
        return Page(self._rows[page_number - 1])

    def __iter__(self) -> Iterator[Page]:
        return (Page(r) for r in self._rows)

    def __len__(self) -> int:
        return len(self._rows)

    # ----------------------------------------------------------------- text

    @property
    def text(self) -> str:
        """All page texts joined in page order (``Document`` reading view)."""
        return "\n\n".join(Page(r).text for r in self._rows)

    # ----------------------------------------------------------- round trip

    def to_json(self) -> str:
        return json.dumps(
            {
                "file_name": self.file_name,
                "document_id": self.document_id,
                "pages": self._rows,
            },
            default=str,
        )

    @classmethod
    def from_json(cls, payload: str) -> "Document":
        d = json.loads(payload)
        return cls(d["file_name"], d["pages"], d.get("document_id"))


def documents_from_dataset(ds, by: str = "file_name", num_buckets: int = 64):
    """Group a page-row Dataset into one row per document:
    ``(file_name, n_pages, document_json)`` — bucketed, never one Ray task
    per document. The JSON column round-trips through
    :meth:`Document.from_json`."""
    import pyarrow as pa

    from .functions.bucketed import bucketed_map_groups

    def per_bucket(g: pa.Table) -> pa.Table:
        rows = g.to_pylist()
        by_doc: dict[str, list[dict]] = {}
        for r in rows:
            by_doc.setdefault(str(r.get(by, "")), []).append(r)
        names = sorted(by_doc)
        return pa.table(
            {
                "file_name": pa.array(names, pa.string()),
                "n_pages": pa.array([len(by_doc[n]) for n in names], pa.int64()),
                "document_json": pa.array(
                    [Document(n, by_doc[n]).to_json() for n in names], pa.string()
                ),
            }
        )

    return bucketed_map_groups(ds, [by], per_bucket, num_buckets)
