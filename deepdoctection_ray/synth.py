"""Deterministic synthetic transcript tables (FIXTURES.md F1).

One row per turn: ``conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us]``. Payload kinds per turn (derived from a
per-(conv, turn) hash — no global RNG state, so generation is reproducible and
parallelizable):

- ``plain``  (~50%): words from a fixed vocabulary;
- ``html``   (~30%): nav/header/footer/link-farm boilerplate wrapped around
  1-4 main-content blocks;
- ``pdfish`` (~20%): pdfplumber-shaped word records with page geometry,
  occasionally including an out-of-page-bounds word and a second column
  (exercising the paragraph-break splitter).

Rows are written in a deterministically *shuffled* order so stable turn
ordering must be restored by groupby(conv_id) + sort(turn_idx), never by
input order. One "hot" conversation has ~100x the median turn count (the
skew case for salted shuffles).

The golden oracle for a row is ``kernels.extract.extract_turn`` run
single-threaded — the same deterministic function the Ray stage applies per
batch, independently verified against the reference implementation by the
kernel test-suite.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .kernels.ids import stable_int

VOCAB = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark ray data block shuffle actor pool arrow text title "
    "page line word column row cell figure list content main body turn"
).split()

ROLES = ("user", "assistant", "tool")
_BASE_TS = dt.datetime(2026, 1, 1, 0, 0, 0)

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _rng(seed: int, *key) -> random.Random:
    return random.Random(stable_int(f"{seed}/" + "/".join(str(k) for k in key)))


def _words(rng: random.Random, lo: int, hi: int) -> list[str]:
    return [rng.choice(VOCAB) for _ in range(rng.randint(lo, hi))]


def _make_plain(rng: random.Random, scale: int = 1) -> str:
    toks = _words(rng, 1, 40 * scale)
    # sprinkle irregular whitespace so normalization is exercised
    sep = [" ", "  ", "\t", "\n", " "]
    return "".join(t + rng.choice(sep) for t in toks)


def _make_html(rng: random.Random, scale: int = 1) -> str:
    nav_links = " ".join(f'<a href="/p{i}">nav{i}</a>' for i in range(rng.randint(2, 5)))
    parts = [
        "<html><head><title>synthetic</title><style>p{margin:0}</style></head><body>",
        f"<nav>{nav_links}</nav>",
        "<header><h1>Site Header</h1></header>",
    ]
    n_blocks = rng.randint(1, 4 * scale)
    for _ in range(n_blocks):
        kind = rng.choice(["p", "h1", "ul"])
        if kind == "p":
            parts.append(f"<p>{' '.join(_words(rng, 4, 20 * scale))}</p>")
        elif kind == "h1":
            parts.append(f"<h1>{' '.join(_words(rng, 2, 6))}</h1>")
        else:
            items = "".join(f"<li>{' '.join(_words(rng, 2, 8))}</li>" for _ in range(rng.randint(2, 3)))
            parts.append(f"<ul>{items}</ul>")
    link_farm = " ".join(f'<a href="/x{i}">more{i}</a>' for i in range(rng.randint(3, 6)))
    parts.append(f'<div>{link_farm}</div>')
    parts.append(f"<footer>copyright <a href='/imprint'>imprint</a></footer>")
    parts.append("</body></html>")
    return "".join(parts)


def _make_pdfish(rng: random.Random, scale: int = 1) -> str:
    width, height = 600, 400
    words = []
    two_cols = rng.random() < 0.3
    n_lines = rng.randint(1, min(5 * scale, 12))  # 12 lines fill the page
    for li in range(n_lines):
        y0 = 40.0 + 28.0 * li
        x = 50.0
        for _ in range(rng.randint(2, 6)):
            t = rng.choice(VOCAB)
            w = 8.0 * len(t)
            words.append({"text": t, "x0": x, "top": y0, "x1": x + w, "bottom": y0 + 18.0})
            x += w + 10.0
        if two_cols:
            x = 330.0
            for _ in range(rng.randint(1, 4)):
                t = rng.choice(VOCAB)
                w = 8.0 * len(t)
                words.append({"text": t, "x0": x, "top": y0, "x1": x + w, "bottom": y0 + 18.0})
                x += w + 10.0
    if rng.random() < 0.2:  # out-of-bounds word, must be filtered
        words.append({"text": "ghost", "x0": 601.0, "top": 10.0, "x1": 640.0, "bottom": 28.0})
    rng.shuffle(words)  # input order must not matter
    return json.dumps({"page": {"width": width, "height": height}, "words": words})


def _fill_block_words(rng: random.Random, words: list, x0: float, y0: float, x1: float, y1: float) -> None:
    """Append word records laid out in lines inside a block box."""
    y = y0 + 4.0
    while y + 14.0 < y1:
        x = x0 + 4.0
        for _ in range(rng.randint(2, 5)):
            t = rng.choice(VOCAB)
            w = 7.0 * len(t)
            if x + w > x1 - 2.0:
                break
            words.append({"text": t, "x0": x, "top": y, "x1": x + w, "bottom": y + 14.0})
            x += w + 8.0
        y += 18.0
        if rng.random() < 0.4:
            break


def _make_layout(rng: random.Random, scale: int = 1) -> str:
    """Detector-output payload: blocks + words (+NMS duplicate, +residuals)."""
    width, height = 600, 400
    blocks: list[dict] = []
    words: list[dict] = []
    y = 30.0
    n_blocks = rng.randint(2, 3 + scale)
    for bi in range(n_blocks):
        cat = "title" if bi == 0 else rng.choice(["text", "text", "list", "table"])
        bh = rng.uniform(40.0, 90.0)
        if y + bh > height - 30.0:
            break
        box = {"x0": 60.0, "top": y, "x1": 540.0, "bottom": y + bh}
        blocks.append({"category": cat, "score": round(rng.uniform(0.7, 0.99), 2), **box})
        if rng.random() < 0.25:  # overlapping duplicate detection → NMS prey
            blocks.append(
                {
                    "category": cat,
                    "score": round(rng.uniform(0.3, 0.6), 2),
                    "x0": box["x0"] + 3,
                    "top": box["top"] + 3,
                    "x1": box["x1"] + 3,
                    "bottom": box["bottom"] + 3,
                }
            )
        _fill_block_words(rng, words, box["x0"], box["top"], box["x1"], box["bottom"])
        y += bh + rng.uniform(10.0, 25.0)
    if rng.random() < 0.5:  # residual words under the last block
        t = rng.choice(VOCAB)
        words.append({"text": t, "x0": 80.0, "top": 380.0, "x1": 80.0 + 7.0 * len(t), "bottom": 394.0})
    rng.shuffle(blocks)
    rng.shuffle(words)
    return json.dumps({"page": {"width": width, "height": height}, "blocks": blocks, "words": words})


def make_layout_docs(n_docs: int = 300, seed: int = 42) -> pa.Table:
    """Deterministic table of layout-detector payloads (doc_id, text)."""
    payloads = [_make_layout(_rng(seed, "layout", i)) for i in range(n_docs)]
    return pa.table(
        {"doc_id": pa.array(range(n_docs), pa.int64()), "text": pa.array(payloads, pa.string())}
    )


def make_link_docs(n_docs: int = 150, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Deterministic caption-link payloads + construction truth.

    Each doc lays out 1-3 figure/table blocks in well-separated vertical
    slots, each with its caption placed directly beneath it (plus an
    occasional unrelated text block). Slots are ≥120px apart while a caption
    sits 6px under its own figure, so the nearest-caption-by-center-distance
    match (``NeighbourMatcher``) provably recovers the construction pairing —
    the truth table ``(doc_id, parent_block, child_block, parent_category)``
    is exact by geometry, not by running the matcher.
    """
    doc_ids, payloads = [], []
    t_doc, t_parent, t_child, t_cat = [], [], [], []
    for i in range(n_docs):
        rng = _rng(seed, "links", i)
        width, height = 600, 800
        n_pairs = rng.randint(1, 3)
        blocks: list[dict] = []
        next_id = 0
        for p in range(n_pairs):
            slot_top = 40.0 + 250.0 * p  # slots 250px apart
            cat = rng.choice(["figure", "figure", "table"])
            fig = {
                "block_id": next_id,
                "category": cat,
                "x0": 60.0 + rng.uniform(0, 40),
                "top": slot_top,
                "x1": 400.0 + rng.uniform(0, 100),
                "bottom": slot_top + rng.uniform(80, 140),
            }
            next_id += 1
            cap = {
                "block_id": next_id,
                "category": "caption",
                "x0": fig["x0"] + rng.uniform(-10, 10),
                "top": fig["bottom"] + 6.0,
                "x1": fig["x1"] - rng.uniform(0, 30),
                "bottom": fig["bottom"] + 24.0,
            }
            next_id += 1
            blocks.extend([fig, cap])
            t_doc.append(i)
            t_parent.append(fig["block_id"])
            t_child.append(cap["block_id"])
            t_cat.append(cat)
        if rng.random() < 0.4:  # unrelated narrative block (never linked)
            blocks.append(
                {
                    "block_id": next_id,
                    "category": "text",
                    "x0": 60.0,
                    "top": 40.0 + 250.0 * n_pairs,
                    "x1": 540.0,
                    "bottom": 40.0 + 250.0 * n_pairs + 60.0,
                }
            )
        rng.shuffle(blocks)
        doc_ids.append(i)
        payloads.append(
            json.dumps({"page": {"width": width, "height": height}, "blocks": blocks})
        )
    docs = pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "payload": pa.array(payloads, pa.string())}
    )
    truth = pa.table(
        {
            "doc_id": pa.array(t_doc, pa.int64()),
            "parent_block": pa.array(t_parent, pa.int64()),
            "child_block": pa.array(t_child, pa.int64()),
            "parent_category": pa.array(t_cat, pa.string()),
        }
    )
    return docs, truth


def make_subimage_docs(n_docs: int = 120, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Deterministic sub-image-layout payloads + construction truth.

    Each doc lays out 1-2 ``table`` blocks in separate 350px vertical slots;
    each table holds 2-4 word ROWS, 30px apart, words 12px tall with ≤18px
    horizontal gaps — so the default line detector (``make_text_lines`` with
    ``make_sub_lines=False``) must recover exactly one line per row, whose
    box is the union of the row's word boxes. All coordinates are integers,
    making the crop → detect → re-embed arithmetic exact. ~15% of tables are
    EMPTY (no words): truth for those is the ``DetectResultGenerator``
    full-frame dummy (score -1.0). Stray words outside every table exercise
    the crop filter. Truth rows: ``(doc_id, parent_block, child_idx,
    category, x0, top, x1, bottom, score, dummy)`` with ``child_idx`` in
    top-to-bottom row order — the detector's creation order."""
    doc_ids, payloads = [], []
    t_rows: list[tuple] = []
    for i in range(n_docs):
        rng = _rng(seed, "subimage", i)
        blocks: list[dict] = []
        words: list[dict] = []
        n_tables = rng.randint(1, 2)
        for p in range(n_tables):
            slot_top = 40 + 350 * p
            tx0 = 50 + rng.randint(0, 30)
            tx1 = 500 + rng.randint(0, 60)
            block_id = p
            empty = rng.random() < 0.15
            n_rows = 0 if empty else rng.randint(2, 4)
            ty1 = slot_top + 20 + max(n_rows, 1) * 30 + 10
            blocks.append(
                {
                    "block_id": block_id, "category": "table",
                    "x0": float(tx0), "top": float(slot_top),
                    "x1": float(tx1), "bottom": float(ty1),
                }
            )
            if empty:
                t_rows.append(
                    (i, block_id, 0, "line", float(tx0), float(slot_top),
                     float(tx1), float(ty1), -1.0, True)
                )
                continue
            for r in range(n_rows):
                row_top = slot_top + 20 + 30 * r
                x = tx0 + 8
                row_boxes = []
                for _w in range(rng.randint(3, 5)):
                    w_len = rng.randint(30, 70)
                    if x + w_len > tx1 - 8:
                        break
                    box = {
                        "text": "w", "x0": float(x), "top": float(row_top),
                        "x1": float(x + w_len), "bottom": float(row_top + 12),
                    }
                    words.append(box)
                    row_boxes.append(box)
                    x += w_len + rng.randint(6, 18)
                t_rows.append(
                    (
                        i, block_id, r, "line",
                        min(b["x0"] for b in row_boxes),
                        float(row_top),
                        max(b["x1"] for b in row_boxes),
                        float(row_top + 12),
                        1.0, False,
                    )
                )
        # stray words outside every table (never matched by the crop)
        for _s in range(rng.randint(0, 2)):
            sx = rng.randint(50, 400)
            words.append(
                {"text": "stray", "x0": float(sx), "top": 770.0,
                 "x1": float(sx + 40), "bottom": 782.0}
            )
        rng.shuffle(words)
        doc_ids.append(i)
        payloads.append(
            json.dumps({"page": {"width": 600, "height": 800}, "blocks": blocks, "words": words})
        )
    docs = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "payload": pa.array(payloads, pa.string()),
        }
    )
    truth = pa.table(
        {
            "doc_id": pa.array([t[0] for t in t_rows], pa.int64()),
            "parent_block": pa.array([t[1] for t in t_rows], pa.int64()),
            "child_idx": pa.array([t[2] for t in t_rows], pa.int64()),
            "category": pa.array([t[3] for t in t_rows], pa.string()),
            "x0": pa.array([t[4] for t in t_rows], pa.float64()),
            "top": pa.array([t[5] for t in t_rows], pa.float64()),
            "x1": pa.array([t[6] for t in t_rows], pa.float64()),
            "bottom": pa.array([t[7] for t in t_rows], pa.float64()),
            "score": pa.array([t[8] for t in t_rows], pa.float64()),
            "dummy": pa.array([t[9] for t in t_rows], pa.bool_()),
        }
    )
    return docs, truth


def make_entity_docs(n_docs: int = 400, seed: int = 42) -> pa.Table:
    """Documents with planted entity tokens (numbers, dates, urls, emails)
    mixed into vocab text, including adjacent same-class runs so successor
    chaining is exercised. The entity oracle derives from the TEXT via the
    same regex lattice in DuckDB — differential, not embedded truth."""
    rows = []
    for i in range(n_docs):
        rng = _rng(seed, "entities", i)
        toks: list[str] = []
        for _ in range(rng.randint(20, 60)):
            r = rng.random()
            if r < 0.70:
                toks.append(rng.choice(VOCAB))
            elif r < 0.80:
                run = rng.randint(1, 3)  # adjacent numbers → successor chain
                for _ in range(run):
                    toks.append(
                        rng.choice(
                            [
                                str(rng.randint(0, 99999)),
                                f"{rng.randint(0, 99)}.{rng.randint(0, 99):02d}",
                                f"{rng.randint(1, 999)},{rng.randint(0, 999):03d}",
                            ]
                        )
                    )
            elif r < 0.85:
                toks.append(
                    rng.choice(
                        [
                            f"{rng.randint(1990, 2030)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}",
                            f"{rng.randint(1, 12)}/{rng.randint(1, 28)}/{rng.randint(10, 99)}",
                        ]
                    )
                )
            elif r < 0.90:
                toks.append(
                    rng.choice(
                        [
                            f"https://example.com/{rng.choice(VOCAB)}",
                            f"www.{rng.choice(VOCAB)}.org",
                        ]
                    )
                )
            elif r < 0.95:
                toks.append(f"{rng.choice(VOCAB)}@{rng.choice(VOCAB)}.com")
            else:
                toks.append(rng.choice(VOCAB) + ".")  # punctuated word (stays OTHER)
        rows.append({"doc_id": i, "text": " ".join(toks)})
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
        }
    )


def make_table_docs(n_docs: int = 200, seed: int = 42) -> pa.Table:
    """Deterministic table-cell payloads (doc_id, text): a jittered R x C cell
    grid whose correct (row, col) assignment is known by construction."""
    payloads = []
    for i in range(n_docs):
        rng = _rng(seed, "table", i)
        n_rows = rng.randint(2, 5)
        n_cols = rng.randint(2, 4)
        cells = []
        for r in range(n_rows):
            for c in range(n_cols):
                if rng.random() < 0.1:
                    continue  # missing tile (sparse table)
                x0 = 50.0 + 120.0 * c + rng.uniform(-4, 4)
                y0 = 40.0 + 40.0 * r + rng.uniform(-4, 4)
                cells.append(
                    {
                        "text": f"r{r}c{c} {rng.choice(VOCAB)}",
                        "x0": x0,
                        "top": y0,
                        "x1": x0 + 110.0,
                        "bottom": y0 + 32.0,
                    }
                )
        rng.shuffle(cells)
        payloads.append(json.dumps({"cells": cells}))
    return pa.table(
        {"doc_id": pa.array(range(n_docs), pa.int64()), "text": pa.array(payloads, pa.string())}
    )


def make_pubtables_docs(n_docs: int = 150, seed: int = 42) -> pa.Table:
    """Deterministic pubtables-style detector payloads: a table box with row /
    column boxes (jittered ≤ ±3 px, pitch 40/120 — centers keep their order)
    and 0-2 spanning cells whose boxes are exact unions of covered tiles. The
    TRUE (row, col, rs, cs) of every span is embedded in the JSON so an
    independent SQL oracle can reconstruct the expected cell tiling."""
    payloads = []
    for i in range(n_docs):
        rng = _rng(seed, "pubtables", i)
        n_rows = rng.randint(2, 5)
        n_cols = rng.randint(2, 4)
        width, height = 120.0 * n_cols, 40.0 * n_rows
        rows = [
            {
                "x0": rng.uniform(0, 10),
                "top": 40.0 * r + (rng.uniform(-3, 3) if r else 0.0),
                "x1": width - rng.uniform(0, 10),
                "bottom": 40.0 * (r + 1) + (rng.uniform(-3, 3) if r < n_rows - 1 else 0.0),
            }
            for r in range(n_rows)
        ]
        cols = [
            {
                "x0": 120.0 * c + (rng.uniform(-3, 3) if c else 0.0),
                "top": rng.uniform(0, 5),
                "x1": 120.0 * (c + 1) + (rng.uniform(-3, 3) if c < n_cols - 1 else 0.0),
                "bottom": height - rng.uniform(0, 5),
            }
            for c in range(n_cols)
        ]
        spans = []
        taken: set[tuple[int, int]] = set()
        for _ in range(rng.randint(0, 2)):
            rs = rng.randint(1, 2)
            cs = rng.randint(1, 2)
            if rs == 1 and cs == 1:
                cs = 2
            if rs > n_rows or cs > n_cols:
                continue
            r0 = rng.randint(1, n_rows - rs + 1)
            c0 = rng.randint(1, n_cols - cs + 1)
            footprint = {(r0 + dr, c0 + dc) for dr in range(rs) for dc in range(cs)}
            if footprint & taken:
                continue
            taken |= footprint
            spans.append(
                {
                    "x0": 120.0 * (c0 - 1),
                    "top": 40.0 * (r0 - 1),
                    "x1": 120.0 * (c0 - 1 + cs),
                    "bottom": 40.0 * (r0 - 1 + rs),
                    "row": r0,
                    "col": c0,
                    "rs": rs,
                    "cs": cs,
                }
            )
        payloads.append(
            json.dumps(
                {
                    "table": {"x0": 0.0, "top": 0.0, "x1": width, "bottom": height},
                    "rows": rows,
                    "cols": cols,
                    "spans": spans,
                    "n_rows": n_rows,
                    "n_cols": n_cols,
                }
            )
        )
    return pa.table(
        {"doc_id": pa.array(range(n_docs), pa.int64()), "text": pa.array(payloads, pa.string())}
    )


def make_pdf_corpus(
    n_docs: int = 40, seed: int = 42
) -> tuple[list[tuple[str, bytes]], list[dict]]:
    """Deterministic real-PDF fixture corpus.

    Returns ``(files, truth)``: ``files`` is ``[(file_name, pdf_bytes)]`` —
    1-3 pages each, words laid out in strict reading order with tight
    intra-line gaps (6 px < the paragraph-break threshold) so the expected
    extraction is known by construction; ``truth`` rows are
    ``{file_name, page_number, text}`` with ``text`` = lines joined by
    newline, words by space. Odd documents use Flate-compressed content
    streams so both filter paths are exercised; every third document is
    written in the PDF-1.5 layout (object streams + predictor-coded xref
    stream) so the modern-container read path is oracle-covered too; every
    fifth is RC4-encrypted (Standard handler, empty password) so the
    decrypt path is oracle-covered as well.
    """
    from .kernels.pdf import write_pdf

    files: list[tuple[str, bytes]] = []
    truth: list[dict] = []
    for i in range(n_docs):
        rng = _rng(seed, "pdf", i)
        n_pages = rng.randint(1, 3)
        pages = []
        for p in range(n_pages):
            width, height = 600.0, 400.0
            words = []
            lines: list[str] = []
            n_lines = rng.randint(1, 8)
            for li in range(n_lines):
                baseline = height - 40.0 - 28.0 * li
                x = 50.0
                line_words = []
                for _ in range(rng.randint(2, 6)):
                    t = rng.choice(VOCAB)
                    words.append((t, x, baseline, 12))
                    x += 0.5 * 12 * len(t) + 6.0
                    line_words.append(t)
                lines.append(" ".join(line_words))
            pages.append({"width": width, "height": height, "words": words})
            # construction-truth raster statistics: the same word geometry
            # the writer emits, boxed exactly as PdfReader.page_words derives
            # it (w = 0.5*size*len, 2-decimal rounding) and pixelized by the
            # shared kernel — the engine must reproduce these through the
            # independent bytes→parser→render path (q_render_pdf oracle)
            from .kernels.raster import ink_stats, render_words

            truth_words = [
                {
                    "x0": round(x, 2),
                    "top": round(height - y - size, 2),
                    "x1": round(x + 0.5 * size * len(t), 2),
                    "bottom": round(height - y, 2),
                }
                for (t, x, y, size) in words
            ]
            stats = ink_stats(render_words(truth_words, width, height, dpi=36))
            truth.append(
                {
                    "file_name": f"doc-{i:03d}.pdf",
                    "page_number": p,
                    "text": "\n".join(lines),
                    **stats,
                }
            )
        files.append(
            (
                f"doc-{i:03d}.pdf",
                write_pdf(
                    pages,
                    compress=bool(i % 2),
                    xref_stream=(i % 3 == 0),
                    encrypt=(i % 5 == 0),
                ),
            )
        )
    return files, truth


def make_deskew_docs(n_docs: int = 100, seed: int = 42) -> pa.Table:
    """Deterministic skewed pages: clean multi-line word grids rotated about
    the page center by a known angle (multiples of 0.5° in [-8, 8]); the true
    angle is embedded so the SQL oracle can assert the estimator's answer."""
    from .kernels.transforms import rotate_boxes_by_degrees

    payloads = []
    angles = []
    for i in range(n_docs):
        rng = _rng(seed, "deskew", i)
        angle = 0.5 * rng.randint(-16, 16)
        boxes = []
        texts = []
        for line in range(rng.randint(6, 12)):
            y = 40.0 + 28.0 * line
            x = 50.0
            for _ in range(rng.randint(4, 8)):
                t = rng.choice(VOCAB)
                w = 7.0 * len(t)
                boxes.append([x, y, x + w, y + 14.0])
                texts.append(t)
                x += w + 8.0
        import numpy as _np

        rot = rotate_boxes_by_degrees(_np.array(boxes), angle, 600.0, 400.0)
        words = [
            {"text": t, "x0": round(b[0], 2), "top": round(b[1], 2),
             "x1": round(b[2], 2), "bottom": round(b[3], 2)}
            for t, b in zip(texts, rot)
        ]
        payloads.append(
            json.dumps({"page": {"width": 600, "height": 400}, "words": words, "true_angle": angle})
        )
        angles.append(angle)
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(payloads, pa.string()),
            "true_angle": pa.array(angles, pa.float64()),
        }
    )


def make_token_seq_corpus(n_docs: int = 200, seed: int = 42) -> pa.Table:
    """Labeled token sequences for the TRAINED token classifier
    (``stages/nbayes.train_token_nb`` — the ``LMTokenClassifierService``
    analog with a real trained model). Each document is a space-joined token
    stream with a parallel space-joined label stream (construction truth:
    the class that generated each token). Class-conditional vocabularies
    overlap enough ("may"/"march" are words AND month-ish; bare numbers
    appear inside dates) that context features genuinely matter, matching
    the word-plus-neighborhood feature set LayoutLM-style token classifiers
    consume. Deterministic for the given seed."""
    rng = np.random.RandomState(seed)
    words = [
        "invoice", "total", "amount", "due", "from", "sent", "contact",
        "order", "may", "march", "paid", "on", "by", "reference", "see",
    ]
    classes = ["number", "date", "url", "email", "word"]

    def gen(cls: str) -> str:
        if cls == "number":
            return str(int(rng.randint(1, 99999)))
        if cls == "date":
            return f"{2019 + int(rng.randint(6)):04d}-{1 + int(rng.randint(12)):02d}-{1 + int(rng.randint(28)):02d}"
        if cls == "url":
            return f"www.site{int(rng.randint(40))}.com/page{int(rng.randint(9))}"
        if cls == "email":
            return f"user{int(rng.randint(60))}@mail{int(rng.randint(12))}.org"
        return words[int(rng.randint(len(words)))]

    ids, texts, labels = [], [], []
    for i in range(n_docs):
        n_tok = 8 + int(rng.randint(18))
        toks, labs = [], []
        for _ in range(n_tok):
            # words dominate, specials interleave — realistic class skew
            cls = classes[int(rng.choice([0, 1, 2, 3, 4], p=[0.15, 0.12, 0.08, 0.08, 0.57]))]
            toks.append(gen(cls))
            labs.append(cls)
        ids.append(3_000_000 + i)
        texts.append(" ".join(toks))
        labels.append(" ".join(labs))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "labels": pa.array(labels, pa.string()),
        }
    )


def make_boilerplate_docs(n_docs: int = 40, repeats: int = 8) -> pa.Table:
    """Deterministic boilerplate corpus for the heavy-hitter oracle: the sf
    documents table is near-uniform (no word 3-gram exceeds N/1024), so a
    non-vacuous heavy-hitter check unions these docs in — each repeats one of
    two fixed sentences, making the sentences' cyclic 3-grams genuinely heavy
    (count ≫ N/256) while the unioned distinct-gram space (~26k) still far
    exceeds the sketch capacity. No RNG: byte-identical every run."""
    sentences = [
        "all rights reserved contact support for help",
        "click here to unsubscribe from this newsletter",
    ]
    ids, texts = [], []
    for i in range(n_docs):
        ids.append(2_000_000 + i)
        texts.append(" ".join([sentences[i % len(sentences)]] * repeats))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def make_bpe_corpus(n_docs: int = 240, seed: int = 42) -> pa.Table:
    """Morphology-rich corpus for BPE tokenizer training: a synthetic
    language of root×suffix words sampled Zipf-style, with punctuation and
    capitalization variation, so character-level merges are meaningful
    (shared roots/suffixes become subword units). Seeded RandomState —
    byte-identical every run."""
    rng = np.random.RandomState(seed)
    roots = [
        "stream", "merg", "sort", "filt", "batch", "tabl", "quer", "wind",
        "custom", "lin", "shuffl", "part", "aggregat", "join", "extract",
        "token", "cluster", "dedup",
    ]
    suffixes = ["", "e", "er", "ers", "ing", "ed", "s", "ation", "y", "ite"]
    vocab = [r + s for r in roots for s in suffixes]
    # Zipf ranks over a fixed shuffle of the vocab
    order = rng.permutation(len(vocab))
    probs = 1.0 / (np.arange(len(vocab)) + 1.0)
    probs /= probs.sum()
    puncts = [".", ",", "!", "?", ";"]
    ids, texts = [], []
    for i in range(n_docs):
        n_words = int(rng.randint(30, 90))
        picks = rng.choice(len(vocab), size=n_words, p=probs)
        words = []
        for j, p in enumerate(picks):
            w = vocab[order[p]]
            if rng.rand() < 0.08:
                w = w.capitalize()
            words.append(w)
            if rng.rand() < 0.12:
                words.append(puncts[int(rng.randint(len(puncts)))])
        ids.append(3_000_000 + i)
        texts.append(" ".join(words))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def make_media_image_corpus(n_docs: int = 60, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Deterministic encoded-image fixture + golden decode stats.

    Each row carries a real encoded payload cycling through every native
    codec path (BMP, PNG × filter types, GIF, TIFF × compressions, PPM,
    baseline JPEG and progressive JPEG). The golden table holds the grayscale
    mean/std/pixel-count computed SINGLE-THREADED through the same
    decode→gray kernels at fixture time — the golden-output pattern
    (fixtures.py docstring): the oracle then checks that the distributed
    actor-pool decode stage reproduces the single-threaded result exactly.
    For the lossless codecs the decoded array additionally equals the
    pre-encode array (pinned in test_imaging.py round trips)."""
    import numpy as _np

    from .kernels.gif import encode_gif
    from .kernels.imaging import decode_image, encode_bmp, encode_ppm, to_grayscale
    from .kernels.jpeg import encode_jpeg, encode_jpeg_progressive
    from .kernels.png import encode_png
    from .kernels.tiff import encode_tiff

    encoders = [
        ("bmp", lambda im: encode_bmp(im)),
        ("png-f0", lambda im: encode_png(im, filter_type=0)),
        ("png-f4", lambda im: encode_png(im, filter_type=4)),
        ("gif", lambda im: encode_gif(im)),
        ("tiff-lzw", lambda im: encode_tiff(im, compression="lzw", predictor=True)),
        ("tiff-packbits", lambda im: encode_tiff(im, compression="packbits")),
        ("ppm", lambda im: encode_ppm(im)),
        ("jpeg", lambda im: encode_jpeg(im, quality=92)),
        ("jpeg-prog", lambda im: encode_jpeg_progressive(im, quality=92)),
    ]
    rng = _np.random.RandomState(seed)
    ids, payloads, mimes = [], [], []
    g_ids, g_mean, g_std, g_npx = [], [], [], []
    for i in range(n_docs):
        name, enc = encoders[i % len(encoders)]
        h, w = int(rng.randint(9, 40)), int(rng.randint(9, 40))
        if name == "gif":
            pal = rng.randint(0, 256, (16, 3), dtype=_np.uint8)
            img = pal[rng.randint(0, 16, (h, w))]
        elif name.startswith("jpeg"):
            sm = rng.randint(0, 256, (h, w, 3)).astype(float)
            for _ in range(3):  # smooth so the lossy path stays tame
                sm = (
                    _np.roll(sm, 1, 0) + _np.roll(sm, -1, 0)
                    + _np.roll(sm, 1, 1) + _np.roll(sm, -1, 1) + sm
                ) / 5
            img = sm.astype(_np.uint8)
        else:
            img = rng.randint(0, 256, (h, w, 3), dtype=_np.uint8)
        payload = enc(img)
        grey = to_grayscale(decode_image(payload))  # single-threaded golden
        ids.append(i)
        payloads.append(payload)
        mimes.append(name)
        g_ids.append(i)
        g_mean.append(round(float(grey.mean()), 6))
        g_std.append(round(float(grey.std()), 6))
        g_npx.append(int(grey.size))
    media = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "codec": pa.array(mimes, pa.string()),
        }
    )
    golden = pa.table(
        {
            "media_id": pa.array(g_ids, pa.int64()),
            "mean": pa.array(g_mean, pa.float64()),
            "std": pa.array(g_std, pa.float64()),
            "n_pixels": pa.array(g_npx, pa.int64()),
        }
    )
    return media, golden


def make_media_audio_corpus(n_docs: int = 40, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Deterministic WAV fixture + golden clip features (same golden-output
    pattern as :func:`make_media_image_corpus`: features computed
    single-threaded through decode at fixture time; the driver checks the
    distributed AudioFeatures stage against them)."""
    import numpy as _np

    from .kernels.wav import (
        audio_features,
        decode_wav,
        encode_wav,
        encode_wav_g711,
        encode_wav_ima_adpcm,
    )

    rng = _np.random.RandomState(seed)
    ids, payloads = [], []
    g = {"media_id": [], "duration_sec": [], "rms": [], "peak": [], "zcr": [],
         "rate": [], "channels": []}
    for i in range(n_docs):
        rate = int(rng.choice([8000, 16000, 22050]))
        bits = int(rng.choice([8, 16, 32]))
        channels = int(rng.choice([1, 2]))
        codec = str(rng.choice(["pcm", "pcm", "ulaw", "alaw", "adpcm"]))
        n = int(rng.randint(rate // 4, rate))
        t = _np.arange(n) / rate
        freq = float(rng.uniform(80, 2000))
        amp = float(rng.uniform(0.2, 0.9))
        sig = amp * _np.sin(2 * _np.pi * freq * t)
        if channels == 2:
            sig = _np.stack([sig, amp * _np.cos(2 * _np.pi * freq * t)], axis=1)
        if codec == "ulaw":
            payload = encode_wav_g711(sig, rate, law="mu")
        elif codec == "alaw":
            payload = encode_wav_g711(sig, rate, law="a")
        elif codec == "adpcm":
            payload = encode_wav_ima_adpcm(sig, rate)
        else:
            payload = encode_wav(sig, rate, bits=bits)
        samples, r = decode_wav(payload)  # single-threaded golden
        f = audio_features(samples, r)
        ids.append(i)
        payloads.append(payload)
        g["media_id"].append(i)
        for k in ("duration_sec", "rms", "peak", "zcr"):
            g[k].append(f[k])
        g["rate"].append(r)
        g["channels"].append(channels)
    media = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    golden = pa.table(
        {
            "media_id": pa.array(g["media_id"], pa.int64()),
            "duration_sec": pa.array(g["duration_sec"], pa.float64()),
            "rms": pa.array(g["rms"], pa.float64()),
            "peak": pa.array(g["peak"], pa.float64()),
            "zcr": pa.array(g["zcr"], pa.float64()),
            "rate": pa.array(g["rate"], pa.int64()),
            "channels": pa.array(g["channels"], pa.int64()),
        }
    )
    return media, golden


_KIND_BUILDERS = {"plain": _make_plain, "html": _make_html, "pdfish": _make_pdfish}
_KIND_TOOL = {"plain": "", "html": "browser", "pdfish": "pdf_reader"}


def turn_payload(seed: int, conv_i: int, turn_idx: int, scale: int = 1) -> tuple[str, str, str]:
    """(kind, text, tool) for one turn — pure function of (seed, conv, turn).

    ``scale`` grows payload sizes (bench corpora use heavier pages; tests the
    light default).
    """
    rng = _rng(seed, "turn", conv_i, turn_idx)
    r = rng.random()
    kind = "plain" if r < 0.5 else ("html" if r < 0.8 else "pdfish")
    return kind, _KIND_BUILDERS[kind](rng, scale), _KIND_TOOL[kind]


def conv_turn_count(seed: int, conv_i: int, hot_factor: int = 100) -> int:
    if conv_i == 0 and hot_factor > 1:
        return 7 * hot_factor
    return _rng(seed, "len", conv_i).randint(2, 12)


def make_transcripts(
    n_convs: int = 200,
    seed: int = 42,
    hot_factor: int = 100,
    shuffled: bool = True,
    conv_lo: int = 0,
    conv_hi: int | None = None,
    scale: int = 1,
) -> pa.Table:
    """Build a (range of a) transcript table in memory.

    ``conv_lo/conv_hi`` generate only that conversation slice — content is
    identical whether generated whole or in slices (pure per-turn functions),
    which is what makes parallel generation deterministic.
    """
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[dt.datetime] = []
    hi = n_convs if conv_hi is None else min(conv_hi, n_convs)
    for i in range(conv_lo, hi):
        cid = f"conv-{i:06d}"
        for t in range(conv_turn_count(seed, i, hot_factor)):
            kind, text, tool = turn_payload(seed, i, t, scale)
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append(ROLES[t % 3])
            texts.append(text)
            tools.append(tool)
            tss.append(_BASE_TS + dt.timedelta(hours=i, seconds=30 * t))
    n = len(conv_ids)
    if shuffled:
        order = sorted(range(n), key=lambda k: stable_int(f"{seed}/shuffle/{conv_ids[k]}/{turn_idxs[k]}"))
    else:
        order = list(range(n))
    return pa.table(
        {
            "conv_id": pa.array([conv_ids[k] for k in order], pa.string()),
            "turn_idx": pa.array([turn_idxs[k] for k in order], pa.int32()),
            "role": pa.array([roles[k] for k in order], pa.string()),
            "text": pa.array([texts[k] for k in order], pa.string()),
            "tool": pa.array([tools[k] for k in order], pa.string()),
            "ts": pa.array([tss[k] for k in order], pa.timestamp("us")),
        },
        schema=SCHEMA,
    )


def write_transcripts(
    path: str,
    n_convs: int = 200,
    seed: int = 42,
    hot_factor: int = 100,
    rows_per_file: int = 250_000,
    scale: int = 1,
) -> str:
    """Write (and cache) a transcript table as a directory of parquet files.

    Re-uses an existing directory when the parameters match (a ``_meta.json``
    marker records them), so bench runs pay generation cost once. Large
    corpora (≥ 5000 conversations) generate in parallel Ray tasks — one
    conversation-range chunk per task, one parquet file per chunk; content is
    deterministic regardless of chunking (per-turn hash RNG).
    """
    meta = {"n_convs": n_convs, "seed": seed, "hot_factor": hot_factor, "scale": scale, "v": 3}
    meta_path = os.path.join(path, "_meta.json")
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as fh:
                if json.load(fh) == meta:
                    return path
        except Exception:
            pass
    os.makedirs(path, exist_ok=True)
    for old in os.listdir(path):
        if old.endswith(".parquet"):
            os.remove(os.path.join(path, old))

    use_ray = False
    if n_convs >= 5000:
        try:
            import ray

            use_ray = ray.is_initialized()
        except ImportError:
            pass

    if use_ray:
        import ray

        chunk = 8000

        @ray.remote
        def gen_chunk(lo: int, hi: int) -> str:
            table = make_transcripts(
                n_convs, seed, hot_factor, conv_lo=lo, conv_hi=hi, scale=scale
            )
            out = os.path.join(path, f"chunk-{lo:010d}.parquet")
            pq.write_table(table, out)
            return out

        ray.get(
            [gen_chunk.remote(lo, min(lo + chunk, n_convs)) for lo in range(0, n_convs, chunk)]
        )
    else:
        table = make_transcripts(n_convs, seed, hot_factor, scale=scale)
        for i in range(0, max(table.num_rows, 1), rows_per_file):
            pq.write_table(
                table.slice(i, rows_per_file), os.path.join(path, f"chunk-{i:010d}.parquet")
            )
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    return path


def oracle_extract(table: pa.Table) -> list[dict]:
    """Single-threaded pure-python golden extraction of a transcript table,
    sorted by (conv_id, turn_idx) — the comparison target for pipeline tests."""
    from .kernels.extract import extract_turn

    rows = sorted(
        zip(table["conv_id"].to_pylist(), table["turn_idx"].to_pylist(), table["text"].to_pylist())
    )
    out = []
    for cid, tix, text in rows:
        res = extract_turn(text)
        out.append({"conv_id": cid, "turn_idx": tix, **res})
    return out


def make_image_dedup_corpus(n_base: int = 24, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Near-duplicate IMAGE corpus + brute-force golden pairs.

    Each base image (smooth gradients — dHash's intended regime) gets 0-2
    near-dup variants: a lossless re-encode in another codec (distance 0),
    a baseline-JPEG re-encode (small distance) or mild additive noise.
    Golden truth is the SINGLE-THREADED brute-force all-pairs dHash Hamming
    scan at threshold 7 over the same payloads — banding in the distributed
    path is pigeonhole-lossless at that threshold, so the oracle checks
    exact equality, not containment."""
    import numpy as _np

    from .kernels.imaging import decode_image, dhash, encode_bmp, encode_ppm, hamming64
    from .kernels.jpeg import encode_jpeg
    from .kernels.png import encode_png

    rng = _np.random.RandomState(seed)
    payloads: list[bytes] = []
    for i in range(n_base):
        h, w = int(rng.randint(24, 48)), int(rng.randint(24, 48))
        gx = _np.linspace(0, rng.uniform(2, 8), w)
        gy = _np.linspace(0, rng.uniform(2, 8), h)
        base = (
            (_np.sin(gy)[:, None] * _np.cos(gx)[None, :] + 1.0) * 110.0
            + rng.uniform(0, 30)
        ).astype(_np.uint8)
        img = _np.stack([base, 255 - base, base.T[:h, :w] if base.T.shape == (h, w) else base], 2)
        encs = [encode_bmp, encode_png, encode_ppm]
        payloads.append(encs[i % 3](img))
        for v in range(int(rng.randint(0, 3))):
            kind = rng.randint(0, 3)
            if kind == 0:  # lossless re-encode, distance 0
                payloads.append(encs[(i + 1 + v) % 3](img))
            elif kind == 1:  # JPEG re-encode, small distance
                payloads.append(encode_jpeg(img, quality=90))
            else:  # mild noise
                noisy = _np.clip(
                    img.astype(int) + rng.randint(-3, 4, img.shape), 0, 255
                ).astype(_np.uint8)
                payloads.append(encs[i % 3](noisy))
    media = pa.table(
        {
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    hashes = [dhash(decode_image(p)) for p in payloads]  # single-threaded golden
    ga, gb, gh = [], [], []
    for a in range(len(hashes)):
        for b in range(a + 1, len(hashes)):
            d = hamming64(hashes[a], hashes[b])
            if d <= 7:
                ga.append(a)
                gb.append(b)
                gh.append(d)
    golden = pa.table(
        {
            "id_a": pa.array(ga, pa.int64()),
            "id_b": pa.array(gb, pa.int64()),
            "hamming": pa.array(gh, pa.int64()),
        }
    )
    return media, golden


def make_audio_dedup_corpus(n_base: int = 20, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Near-duplicate AUDIO corpus + brute-force golden pairs (the audio
    twin of :func:`make_image_dedup_corpus`): each base clip gets 0-2
    variants — a G.711 or 8-bit-PCM re-encode (fingerprint distance ~0) or
    an IMA ADPCM re-encode (small distance). Golden = single-threaded
    all-pairs fingerprint Hamming at threshold 7 (pigeonhole-lossless in the
    distributed path, so equality is exact)."""
    import numpy as _np

    from .kernels.imaging import hamming64
    from .kernels.wav import (
        audio_fingerprint,
        decode_wav,
        encode_wav,
        encode_wav_g711,
        encode_wav_ima_adpcm,
    )

    rng = _np.random.RandomState(seed)
    payloads: list[bytes] = []
    rate = 8000
    for i in range(n_base):
        n = int(rng.randint(rate // 2, rate))
        t = _np.arange(n) / rate
        env = 0.3 + 0.5 * _np.abs(_np.sin(2 * _np.pi * rng.uniform(1, 5) * t))
        sig = env * _np.sin(2 * _np.pi * rng.uniform(150, 1500) * t)
        payloads.append(encode_wav(sig, rate, bits=16))
        for _v in range(int(rng.randint(0, 3))):
            kind = rng.randint(0, 4)
            if kind == 0:
                payloads.append(encode_wav_g711(sig, rate, law="mu"))
            elif kind == 1:
                payloads.append(encode_wav_g711(sig, rate, law="a"))
            elif kind == 2:
                payloads.append(encode_wav(sig, rate, bits=8))
            else:
                payloads.append(encode_wav_ima_adpcm(sig, rate))
    media = pa.table(
        {
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    fps = [audio_fingerprint(*decode_wav(p)) for p in payloads]
    ga, gb, gh = [], [], []
    for a in range(len(fps)):
        for b in range(a + 1, len(fps)):
            d = hamming64(fps[a], fps[b])
            if d <= 7:
                ga.append(a)
                gb.append(b)
                gh.append(d)
    golden = pa.table(
        {
            "id_a": pa.array(ga, pa.int64()),
            "id_b": pa.array(gb, pa.int64()),
            "hamming": pa.array(gh, pa.int64()),
        }
    )
    return media, golden
