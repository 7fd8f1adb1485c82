"""Text assembly: ordered blocks of ordered words → one turn string + spans.

Mirrors the reference's final projection:

- block text = ``" ".join(ordered words)`` (``view.py:459-466``);
- turn text  = block texts joined by ``"\\n"`` in block reading order, with the
  trailing break stripped (``view.py:1323-1329`` — the ``text[:-1]``);
- span offsets are this engine's replacement for the reference's word→ann-id
  lists (``view.py:477-550``): each word gets its ``[start, end)`` character
  range in the assembled string, plus the ordered block index, the block
  category and the word's within-block reading order.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Block:
    """One ordered text block of a turn (the `Layout` view analog)."""

    category: str
    words: list[str]  # already in within-block reading order
    bbox: tuple[float, float, float, float] | None = None
    meta: dict = field(default_factory=dict)


def assemble_turn(blocks: list[Block]) -> tuple[str, dict[str, list]]:
    """Join ordered blocks into the turn's extracted text and span records.

    Args:
        blocks: blocks already in reading order, words already ordered.

    Returns:
        ``(text, spans)`` where spans holds five parallel lists —
        ``start, end, block_idx, category, reading_order`` (reading_order is
        the 1-based word position within its block, matching the reference's
        per-word READING_ORDER sub-category). Parallel lists instead of
        per-span dicts: the Ray stage assembles them into Arrow struct arrays
        without touching a python dict per word.
    """
    parts: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    block_idxs: list[int] = []
    categories: list[str] = []
    orders: list[int] = []
    offset = 0
    for b_idx, block in enumerate(blocks):
        if b_idx > 0:
            offset += 1  # the "\n" separator
        cat = block.category
        for w_idx, word in enumerate(block.words):
            if w_idx > 0:
                offset += 1  # the " " separator
            end = offset + len(word)
            starts.append(offset)
            ends.append(end)
            block_idxs.append(b_idx)
            categories.append(cat)
            orders.append(w_idx + 1)
            offset = end
        parts.append(" ".join(block.words))
    return "\n".join(parts), {
        "start": starts,
        "end": ends,
        "block_idx": block_idxs,
        "category": categories,
        "reading_order": orders,
    }
