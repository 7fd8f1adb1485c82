"""Per-turn extraction dispatcher.

The analog of ``TextExtractionService.get_predictor_input`` +
miner-vs-OCR arbitration (``pipe/text.py:176-209``,
``analyzer/factory.py:1766-1776``): each turn's payload self-identifies as

- ``pdfish`` — a JSON object with a ``words`` list (pdfplumber word dicts);
- ``html``  — markup containing at least one tag;
- ``plain`` — anything else.

and is routed to the matching kernel. Errors never propagate: a poison row
yields empty output plus an ``error`` string (the ``MappingContextManager``
dead-letter pattern, ``mapper/maputils.py:41-130``).
"""

from __future__ import annotations

import re

from .assemble import Block, assemble_turn
from .html_blocks import DEFAULT_MAX_LINK_DENSITY, _BlockCollector, parse_html_blocks
from .normalize import tokenize_plain
from .pdf_layout import extract_pdfish
from .reading_order import PARAGRAPH_BREAK

_TAG_RE = re.compile(r"<[a-zA-Z!/]")
_PDFISH_RE = re.compile(r'^\s*\{')


def classify_payload(text: str) -> str:
    """Cheap payload-kind sniffing; deterministic and order-independent."""
    if not text:
        return "plain"
    if _PDFISH_RE.match(text):
        head = text[:2048]
        if '"blocks"' in head:
            return "layout"
        if '"words"' in head:
            return "pdfish"
    if _TAG_RE.search(text):
        return "html"
    return "plain"


def extract_turn(
    text: str,
    kind: str | None = None,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
    paragraph_break: float = PARAGRAPH_BREAK,
    html_parser: _BlockCollector | None = None,
    deskew: bool = False,
) -> dict:
    """Extract one turn → dict with extracted_text / spans / blocks / kind / error.

    This is both the hot-path kernel (called by the Ray actor per row) and the
    single-threaded pure-python oracle used to derive golden outputs
    (FIXTURES.md F1): they are the same deterministic function.
    """
    k = kind or classify_payload(text)
    try:
        if k == "layout":
            from .layout_doc import extract_layout

            blocks = extract_layout(text, paragraph_break=paragraph_break)
        elif k == "pdfish":
            if deskew:
                from .pdf_layout import extract_pdfish_deskewed

                blocks, _ = extract_pdfish_deskewed(text, paragraph_break)
            else:
                blocks = extract_pdfish(text, paragraph_break)
        elif k == "html":
            blocks = parse_html_blocks(text, max_link_density, parser=html_parser)
        else:
            tokens = tokenize_plain(text)
            blocks = [Block(category="text", words=tokens)] if tokens else []
        extracted, spans = assemble_turn(blocks)
        return {
            "extracted_text": extracted,
            "spans": spans,
            "blocks": {
                "category": [b.category for b in blocks],
                "reading_order": list(range(1, len(blocks) + 1)),
                "n_words": [len(b.words) for b in blocks],
            },
            "payload_kind": k,
            "error": None,
        }
    except Exception as exc:  # dead-letter, never fail the batch
        return {
            "extracted_text": "",
            "spans": {"start": [], "end": [], "block_idx": [], "category": [], "reading_order": []},
            "blocks": {"category": [], "reading_order": [], "n_words": []},
            "payload_kind": k,
            "error": f"{type(exc).__name__}: {exc}",
        }
