"""PDF text-layer payload → ordered text blocks.

A ``pdfish`` transcript payload is the JSON shape a pdfplumber-style miner
emits (reference ``extern/pdftext.py:41-47``):

    {"page": {"width": W, "height": H},
     "words": [{"text": str, "x0": f, "top": f, "x1": f, "bottom": f}, ...]}

The kernel replays the flagship pipeline's miner-only configuration
(``analyzer/factory.py:1766-1776`` — no layout detector, so every word is a
residual text container):

1. out-of-page-bounds words are skipped (``pipe/text.py:132-137``: any
   coordinate ≥ page width/height drops the word);
2. boxes snap to ints with the reference's half-up/half-down construction
   rounding (``box.py:268-276``);
3. synthetic LINEs are built with sub-line splitting at ``paragraph_break``
   (``TextLineGenerator``, ``order.py:389-524``);
4. lines act as floating text blocks and get a reading order via
   ``order_blocks`` (``order.py:201-330``);
5. words are ordered within each line via ``group_words_into_lines``
   (``order.py:72-132``).
"""

from __future__ import annotations

import json

import numpy as np

from . import boxes as B
from .assemble import Block
from .normalize import clean_token
from .reading_order import PARAGRAPH_BREAK, group_words_into_lines, order_blocks, rel_centers
from .textlines import make_text_lines


def parse_pdfish_payload(payload: str) -> tuple[list[str], np.ndarray, float, float, int]:
    """Decode the JSON payload into (texts, abs boxes, width, height, rotation)."""
    doc = json.loads(payload)
    page = doc.get("page") or {}
    width = float(page.get("width", 612.0))
    height = float(page.get("height", 792.0))
    rotation = int(page.get("rotation", 0))
    words = doc.get("words") or []
    texts: list[str] = []
    raw: list[list[float]] = []
    for w in words:
        x0, top, x1, bottom = float(w["x0"]), float(w["top"]), float(w["x1"]), float(w["bottom"])
        # page-bounds filter, pipe/text.py:132-137
        if x0 >= width or top >= height or x1 >= width or bottom >= height:
            continue
        token = clean_token(str(w["text"]))
        if not token:
            continue
        texts.append(token)
        raw.append([x0, top, x1, bottom])
    if not raw:
        return [], np.empty((0, 4)), width, height, rotation
    return texts, B.snap_abs(np.array(raw, dtype=np.float64)), width, height, rotation


def blocks_from_words(
    texts: list[str],
    word_boxes: np.ndarray,
    width: float,
    height: float,
    paragraph_break: float = PARAGRAPH_BREAK,
) -> list[Block]:
    """Words with geometry → reading-ordered blocks (steps 3–5 above)."""
    if word_boxes.shape[0] == 0:
        return []
    # ordering runs on RELATIVE coords: after image_ann_to_image every word's
    # base-frame embedding is relative (image.py:843-844), so the real
    # pipeline's line grouping sees unrounded relative floats
    rel = B.to_relative(word_boxes, width, height)
    rel_list = rel.tolist()
    centers = rel_centers(rel_list)  # hoisted: ordering calls reuse them
    lines = make_text_lines(rel_list, 1.0, 1.0, True, paragraph_break, absolute=False, centers=centers)
    line_boxes = np.stack([box for box, _ in lines])
    line_order = order_blocks(line_boxes)
    blocks: list[Block] = []
    for li in line_order:
        box, members = lines[li]
        word_order = group_words_into_lines(
            [rel_list[m] for m in members], absolute=False,
            centers=[centers[m] for m in members],
        )
        ordered_words = [texts[members[t[2]]] for t in word_order]
        blocks.append(
            Block(category="line", words=ordered_words, bbox=tuple(float(v) for v in box))
        )
    return blocks


def extract_pdfish(payload: str, paragraph_break: float = PARAGRAPH_BREAK) -> list[Block]:
    """Full pdfish path: JSON → filtered words → (rotation) → ordered blocks.

    A ``page.rotation`` of 90/180/270 marks content that must be rotated CCW
    by that angle to restore reading orientation — the
    ``SimpleTransformService`` analog (``pipe/transform.py:33-113``): the
    rotation is applied to the coordinates before any ordering runs.
    """
    texts, word_boxes, width, height, rotation = parse_pdfish_payload(payload)
    if rotation % 360 and word_boxes.shape[0]:
        from .transforms import rotate_boxes, rotated_extent

        word_boxes = rotate_boxes(word_boxes, rotation, width, height)
        width, height = rotated_extent(rotation, width, height)
    return blocks_from_words(texts, word_boxes, width, height, paragraph_break)


def extract_pdfish_deskewed(
    payload: str,
    paragraph_break: float = PARAGRAPH_BREAK,
    min_angle: float = 0.5,
) -> tuple[list[Block], float]:
    """OPT-IN deskewing variant (``USE_DESKEW`` in the analyzer config): after
    the right-angle rotation handling, the residual small-angle skew is
    ESTIMATED from the word geometry (projection profile + per-line
    regression, ``transforms.estimate_skew_angle``) and applied before any
    ordering runs — the full ``SimpleTransformService`` including the angle
    estimation the reference delegates to its deskew predictor
    (``extern/deskew.py:37``). Returns ``(blocks, applied_angle_deg)``.

    Kept OUT of the default path on purpose: the default pipeline is pinned
    bit-exact against the reference, which does not deskew unless configured.
    """
    texts, word_boxes, width, height, rotation = parse_pdfish_payload(payload)
    if rotation % 360 and word_boxes.shape[0]:
        from .transforms import rotate_boxes, rotated_extent

        word_boxes = rotate_boxes(word_boxes, rotation, width, height)
        width, height = rotated_extent(rotation, width, height)
    applied = 0.0
    if word_boxes.shape[0] >= 3:
        from .transforms import estimate_skew_angle, rotate_boxes_by_degrees

        angle = estimate_skew_angle(word_boxes)
        if abs(angle) >= min_angle:
            word_boxes = rotate_boxes_by_degrees(word_boxes, angle, width, height)
            applied = angle
    return blocks_from_words(texts, word_boxes, width, height, paragraph_break), applied
