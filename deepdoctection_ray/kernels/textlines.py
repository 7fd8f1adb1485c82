"""Synthetic text-line construction from word boxes.

Mirrors the reference's ``TextLineGenerator`` (``pipe/order.py:389-524``): rows
of words become LINE records; when ``make_sub_lines`` is on, a horizontal gap
wider than ``paragraph_break`` (relative coords) splits a row into sub-lines,
which is how a multi-column structure is detected from bare word boxes.

This is the path a turn takes when its payload has word geometry but no
detected layout blocks (the pdfminer/OCR-only configuration of the flagship
pipeline, ``analyzer/factory.py:1766-1776``): every word is "residual", lines
are synthesized, and the lines act as the floating text blocks.

Hot loops run on plain python floats (lists), not numpy rows — the typical
turn has 5-50 words, where per-element ndarray indexing would dominate.
"""

from __future__ import annotations

import numpy as np

from .reading_order import PARAGRAPH_BREAK, group_words_into_lines


def _merge_list(boxes: list[list[float]], members: list[int]) -> np.ndarray:
    """Smallest box containing the member boxes (``box.py:757-773``)."""
    return np.array(
        [
            min(boxes[i][0] for i in members),
            min(boxes[i][1] for i in members),
            max(boxes[i][2] for i in members),
            max(boxes[i][3] for i in members),
        ],
        dtype=np.float64,
    )


def make_text_lines(
    word_boxes: np.ndarray,
    width: float,
    height: float,
    make_sub_lines: bool = True,
    paragraph_break: float = PARAGRAPH_BREAK,
    absolute: bool = True,
    centers: list[tuple[float, float]] | None = None,
) -> list[tuple[np.ndarray, list[int]]]:
    """Build synthetic lines from word boxes — ``order.py:423-524``.

    Args:
        word_boxes: ``[N, 4]`` xyxy word boxes; pass RELATIVE boxes with
            ``width=height=1.0, absolute=False`` to replicate the real
            pipeline (words carry relative embeddings after
            ``image_ann_to_image``, ``image.py:843-844``).
        width / height: page extent (for the relative gap threshold).

    Returns:
        List of ``(line_box, member_word_indices)`` in creation order; the
        member indices index into ``word_boxes`` and are ulx-sorted within a
        row segment.
    """
    boxes = word_boxes.tolist() if hasattr(word_boxes, "tolist") else list(word_boxes)
    if not boxes:
        return []
    return _lines_rec(
        boxes, list(range(len(boxes))), width, make_sub_lines, paragraph_break, True, absolute,
        centers,
    )


def _lines_rec(
    boxes: list[list[float]],
    subset: list[int],
    width: float,
    make_sub_lines: bool,
    paragraph_break: float,
    highest_level: bool,
    absolute: bool = True,
    centers: list[tuple[float, float]] | None = None,
) -> list[tuple[np.ndarray, list[int]]]:
    order = group_words_into_lines(
        [boxes[i] for i in subset],
        absolute=absolute,
        centers=None if centers is None else [centers[i] for i in subset],
    )
    n_rows = max(t[1] for t in order)
    if n_rows == 1 and not highest_level:
        return []  # order.py:456-457: single-row recursion → caller merges

    out: list[tuple[np.ndarray, list[int]]] = []
    for row_no in range(1, n_rows + 1):
        members = [subset[t[2]] for t in order if t[1] == row_no]
        members.sort(key=lambda i: boxes[i][0])  # order.py:464

        if len(members) < 2 or not make_sub_lines:
            out.append((_merge_list(boxes, members), members))
            continue

        segment: list[int] = []
        last = len(members) - 1
        for pos, i in enumerate(members):
            if pos == 0:
                segment = [i]
                if last == 0:
                    break  # single member handled above; unreachable, guard only
                continue
            gap = boxes[i][0] / width - boxes[members[pos - 1]][2] / width
            if gap < paragraph_break:
                segment.append(i)
            else:
                nested = _lines_rec(boxes, segment, width, make_sub_lines, paragraph_break, False, absolute, centers)
                if nested:
                    # a sub-line that itself spans rows keeps its nested split
                    # (order.py:499-503)
                    out.extend(nested)
                else:
                    out.append((_merge_list(boxes, segment), segment))
                    segment = [i]
            if pos == last:
                nested = _lines_rec(boxes, segment, width, make_sub_lines, paragraph_break, False, absolute, centers)
                if nested:
                    out.extend(nested)
                else:
                    out.append((_merge_list(boxes, segment), segment))
    return out
