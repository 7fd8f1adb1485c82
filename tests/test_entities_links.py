"""Entity surface (Page.get_entities / entity_rows), layout links
(NeighbourMatcher composition) and Table.kv_header_rows — reference parity:
dd_core/datapoint/view.py:678-728, 1756-1784; pipe/common.py:180-358."""

from __future__ import annotations

import json

import pyarrow as pa


def _classified_row():
    text = "total 12.50 2023-05-17 see www.x.org now"
    toks = text.split()
    spans, pos = [], 0
    for i, t in enumerate(toks):
        spans.append(
            {"start": pos, "end": pos + len(t), "block_idx": 0, "category": "text", "reading_order": i}
        )
        pos += len(t) + 1
    return {
        "doc_id": "d1",
        "extracted_text": text,
        "spans": spans,
        "token_classes": ["word", "number", "date", "word", "url", "word"],
    }


def test_page_get_entities_reference_shape():
    from deepdoctection_ray.view import Page

    ents = Page(_classified_row()).get_entities()
    assert [e["word"] for e in ents] == ["12.50", "2023-05-17", "www.x.org"]
    assert [e["entity"] for e in ents] == ["number", "date", "url"]
    assert ents[0]["annotation_id"] == "d1/1"
    # no adjacent same-class neighbors → no successors
    assert all(e["successor_annotation_id"] is None for e in ents)


def test_entity_successor_chains_adjacent_same_class():
    from deepdoctection_ray.kernels.entities import entities_of_row

    text = "a 1 2 3 b"
    spans = []
    pos = 0
    for t in text.split():
        spans.append({"start": pos, "end": pos + len(t)})
        pos += len(t) + 1
    ents = entities_of_row("d", text, spans, ["word", "number", "number", "number", "word"])
    assert [e["word"] for e in ents] == ["1", "2", "3"]
    assert [e["successor_annotation_id"] for e in ents] == ["d/2", "d/3", None]


def test_entity_rows_batch(ray_session):
    from deepdoctection_ray.kernels.entities import entity_rows

    row = _classified_row()
    batch = pa.Table.from_pylist([row])
    out = entity_rows(batch)
    assert out.num_rows == 3
    assert out["entity"].to_pylist() == ["number", "date", "url"]
    assert out["tok_idx"].to_pylist() == [1, 2, 4]


def test_layout_linker_nearest_caption():
    from deepdoctection_ray.stages.links import links_for_payload

    payload = json.dumps(
        {
            "blocks": [
                {"block_id": 7, "category": "figure", "x0": 0, "top": 0, "x1": 100, "bottom": 80},
                {"block_id": 8, "category": "caption", "x0": 0, "top": 86, "x1": 100, "bottom": 100},
                {"block_id": 9, "category": "figure", "x0": 0, "top": 300, "x1": 100, "bottom": 380},
                {"block_id": 10, "category": "caption", "x0": 0, "top": 386, "x1": 100, "bottom": 400},
                {"block_id": 11, "category": "text", "x0": 0, "top": 150, "x1": 100, "bottom": 200},
            ]
        }
    )
    links = links_for_payload(payload)
    pairs = {(l["parent_block"], l["child_block"]) for l in links}
    assert pairs == {(7, 8), (9, 10)}
    assert all(l["child_category"] == "caption" for l in links)


def test_link_fixture_truth_matches_matcher():
    """The generator's geometric guarantee holds: the matcher recovers the
    embedded truth pairing on every fixture doc."""
    from deepdoctection_ray.stages.links import links_for_payload
    from deepdoctection_ray.synth import make_link_docs

    docs, truth = make_link_docs(40, seed=7)
    want = {
        (d, p, c)
        for d, p, c in zip(
            truth["doc_id"].to_pylist(),
            truth["parent_block"].to_pylist(),
            truth["child_block"].to_pylist(),
        )
    }
    got = set()
    for doc_id, payload in zip(docs["doc_id"].to_pylist(), docs["payload"].to_pylist()):
        for l in links_for_payload(payload):
            got.add((doc_id, l["parent_block"], l["child_block"]))
    assert got == want


GRID = [
    {"row": 1, "col": 1, "text": "Header1"},
    {"row": 1, "col": 2, "text": "Header2"},
    {"row": 2, "col": 1, "text": "Value1"},
    {"row": 2, "col": 2, "text": "Value2"},
    {"row": 3, "col": 1, "text": "Value3"},
    {"row": 3, "col": 2, "text": "Value4"},
]


def test_kv_header_rows_reference_example():
    """The exact docstring example of the reference (view.py:695-707):
    kv_header_rows over a 2x2 body with a header row."""
    from deepdoctection_ray.view import TableView

    t = TableView(GRID)
    assert t.kv_header_rows(2) == {"(1, 'Header1')": "Value1", "(2, 'Header2')": "Value2"}
    assert t.kv_header_rows(3) == {"(1, 'Header1')": "Value3", "(2, 'Header2')": "Value4"}
    assert t.number_of_rows == 3 and t.number_of_columns == 2


def test_kv_header_rows_spanning_cells():
    """Spanning header covers two columns (header.col ≤ cell.col ≤
    header.col+span-1, view.py:722-727); spanning body cell appears in every
    row it covers (view.py:713-716)."""
    from deepdoctection_ray.view import TableView

    cells = [
        {"row": 1, "col": 1, "col_span": 2, "text": "Wide", "is_header": True},
        {"row": 1, "col": 3, "text": "Narrow", "is_header": True},
        {"row": 2, "col": 1, "text": "a"},
        {"row": 2, "col": 2, "text": "b"},
        {"row": 2, "col": 3, "row_span": 2, "text": "tall"},
        {"row": 3, "col": 1, "text": "c"},
    ]
    t = TableView(cells)
    # 'Wide' covers cols 1-2: later cell (col 2) overwrites col 1's value,
    # exactly the reference's dict-overwrite behavior
    assert t.kv_header_rows(2) == {"(1, 'Wide')": "b", "(3, 'Narrow')": "tall"}
    # row 3 sees the row-spanning cell from row 2
    assert t.kv_header_rows(3) == {"(1, 'Wide')": "c", "(3, 'Narrow')": "tall"}
    assert [c["text"] for c in t.column_header_cells] == ["Wide", "Narrow"]
