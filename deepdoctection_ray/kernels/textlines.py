"""Synthetic text-line construction from word boxes.

Mirrors the reference's ``TextLineGenerator`` (``pipe/order.py:389-524``): rows
of words become LINE records; when ``make_sub_lines`` is on, a horizontal gap
wider than ``paragraph_break`` (relative coords) splits a row into sub-lines,
which is how a multi-column layout is detected from bare word boxes.

This is the path a turn takes when its payload has word geometry but no
detected layout blocks (the pdfminer/OCR-only configuration of the flagship
pipeline, ``analyzer/factory.py:1766-1776``): every word is "residual", lines
are synthesized, and the lines act as the floating text blocks.
"""

from __future__ import annotations

import numpy as np

from . import boxes as B
from .reading_order import PARAGRAPH_BREAK, group_words_into_lines


def make_text_lines(
    word_boxes: np.ndarray,
    width: float,
    height: float,
    make_sub_lines: bool = True,
    paragraph_break: float = PARAGRAPH_BREAK,
    _highest_level: bool = True,
) -> list[tuple[np.ndarray, list[int]]]:
    """Build synthetic lines from word boxes — ``order.py:423-524``.

    Args:
        word_boxes: ``[N, 4]`` absolute xyxy word boxes.
        width / height: page extent (for the relative gap threshold).

    Returns:
        List of ``(line_box, member_word_indices)`` in creation order; the
        member indices index into ``word_boxes`` and are ulx-sorted within a
        row segment.
    """
    n = word_boxes.shape[0]
    if n == 0:
        return []
    order = group_words_into_lines(word_boxes)
    n_rows = max(t[1] for t in order)
    if n_rows == 1 and not _highest_level:
        return []  # order.py:456-457: single-row recursion → caller merges

    out: list[tuple[np.ndarray, list[int]]] = []
    for row_no in range(1, n_rows + 1):
        members = [t[2] for t in order if t[1] == row_no]
        members.sort(key=lambda i: word_boxes[i, 0])  # order.py:464

        if len(members) < 2 or not make_sub_lines:
            out.append((B.merge(word_boxes[members]), members))
            continue

        segment: list[int] = []
        for pos, i in enumerate(members):
            if pos == 0:
                segment = [i]
                continue
            prev = word_boxes[members[pos - 1]]
            cur = word_boxes[i]
            gap = cur[0] / width - prev[2] / width  # relative-coordinate gap
            if gap < paragraph_break:
                segment.append(i)
            else:
                nested = make_text_lines(
                    word_boxes[segment], width, height, make_sub_lines, paragraph_break, False
                )
                if nested:
                    # a sub-line that itself spans rows: keep nested splits,
                    # remapping local indices (order.py:499-503)
                    out.extend((box, [segment[k] for k in mem]) for box, mem in nested)
                else:
                    out.append((B.merge(word_boxes[segment]), segment))
                    segment = [i]
            if pos == len(members) - 1:
                nested = make_text_lines(
                    word_boxes[segment], width, height, make_sub_lines, paragraph_break, False
                )
                if nested:
                    out.extend((box, [segment[k] for k in mem]) for box, mem in nested)
                else:
                    out.append((B.merge(word_boxes[segment]), segment))
    return out
