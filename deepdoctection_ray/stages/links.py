"""Layout-link matching stage — the ``NeighbourMatcher`` + ``MatchingService``
composition (``deepdoctection/pipe/common.py:180-358``) as a Ray Data stage.

The reference wires ``MatchingService(family_compounds=[FamilyCompound(
relationship_key=LAYOUT_LINK, parent_categories=["figure"],
child_categories=["caption"])], matcher=NeighbourMatcher())`` into the
analyzer so every figure/table receives its nearest caption as a
``layout_link`` relationship. Here the same per-record match runs vectorized
inside ``map_batches`` over detector-output payloads: parents and children
are selected by category, matched with :func:`kernels.matching.
match_by_distance` (nearest child by center distance, ``match.py:203-214``),
and each link becomes one flat output row — joinable, shuffle-safe, no
mutable annotation graph.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..kernels.matching import match_by_distance

DEFAULT_PARENTS = ("figure", "table")
DEFAULT_CHILDREN = ("caption",)


def links_for_payload(
    payload: str,
    parent_categories=DEFAULT_PARENTS,
    child_categories=DEFAULT_CHILDREN,
) -> list[dict]:
    """Layout links for one detector-output payload: each parent block is
    linked to its nearest child block. Blocks are identified by their
    ``block_id`` field when present, else by their index in the payload."""
    doc = json.loads(payload)
    blocks = doc.get("blocks") or []
    parents = [
        (b.get("block_id", i), b) for i, b in enumerate(blocks)
        if b.get("category") in parent_categories
    ]
    children = [
        (b.get("block_id", i), b) for i, b in enumerate(blocks)
        if b.get("category") in child_categories
    ]
    if not parents or not children:
        return []
    p_boxes = np.array(
        [[b["x0"], b["top"], b["x1"], b["bottom"]] for _, b in parents], dtype=np.float64
    )
    c_boxes = np.array(
        [[b["x0"], b["top"], b["x1"], b["bottom"]] for _, b in children], dtype=np.float64
    )
    nearest = match_by_distance(p_boxes, c_boxes)
    return [
        {
            "parent_block": int(parents[pi][0]),
            "child_block": int(children[ci][0]),
            "parent_category": parents[pi][1].get("category", ""),
            "child_category": children[ci][1].get("category", ""),
        }
        for pi, ci in enumerate(nearest)
    ]


class LayoutLinker:
    """Actor stage: payload rows → flat link rows
    ``(doc_id, parent_block, child_block, parent_category, child_category)``."""

    def __init__(
        self,
        payload_column: str = "payload",
        id_column: str = "doc_id",
        parent_categories=DEFAULT_PARENTS,
        child_categories=DEFAULT_CHILDREN,
    ) -> None:
        self._payload = payload_column
        self._id = id_column
        self._parents = tuple(parent_categories)
        self._children = tuple(child_categories)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self._id].to_pylist()
        payloads = batch[self._payload].to_pylist()
        o_id, o_p, o_c, o_pc, o_cc = [], [], [], [], []
        for doc_id, payload in zip(ids, payloads):
            for link in links_for_payload(payload or "{}", self._parents, self._children):
                o_id.append(doc_id)
                o_p.append(link["parent_block"])
                o_c.append(link["child_block"])
                o_pc.append(link["parent_category"])
                o_cc.append(link["child_category"])
        return pa.table(
            {
                "doc_id": pa.array(o_id, batch[self._id].type),
                "parent_block": pa.array(o_p, pa.int64()),
                "child_block": pa.array(o_c, pa.int64()),
                "parent_category": pa.array(o_pc, pa.string()),
                "child_category": pa.array(o_cc, pa.string()),
            }
        )
