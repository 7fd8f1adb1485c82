"""SubImageLayoutService analog (stages/sub_layout.py): crop → child detect →
DetectResultGenerator dummy fill → re-embed (pipe/sub_layout.py:60-250)."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd


def _payload(blocks, words, w=600, h=800):
    return json.dumps({"page": {"width": w, "height": h}, "blocks": blocks, "words": words})


def test_sub_layout_detects_lines_in_parent_coords():
    from deepdoctection_ray.stages.sub_layout import sub_layouts_for_payload

    blocks = [{"block_id": 7, "category": "table", "x0": 100, "top": 200, "x1": 500, "bottom": 400}]
    words = [
        {"text": "a", "x0": 120, "top": 220, "x1": 180, "bottom": 232},
        {"text": "b", "x0": 200, "top": 220, "x1": 260, "bottom": 232},
        {"text": "c", "x0": 120, "top": 300, "x1": 250, "bottom": 312},
        # stray word outside the table — must not join any line
        {"text": "stray", "x0": 10, "top": 700, "x1": 60, "bottom": 712},
    ]
    out = sub_layouts_for_payload(_payload(blocks, words))
    assert [d["category"] for d in out] == ["line", "line"]
    assert all(d["parent_block"] == 7 for d in out)
    # page coordinates, top-to-bottom order
    assert (out[0]["x0"], out[0]["top"], out[0]["x1"], out[0]["bottom"]) == (120, 220, 260, 232)
    assert (out[1]["x0"], out[1]["top"]) == (120, 300)
    assert [d["child_idx"] for d in out] == [0, 1]
    assert not any(d["dummy"] for d in out)


def test_sub_layout_dummy_fill_for_empty_parent():
    from deepdoctection_ray.stages.sub_layout import sub_layouts_for_payload

    blocks = [{"block_id": 0, "category": "table", "x0": 50, "top": 40, "x1": 550, "bottom": 140}]
    out = sub_layouts_for_payload(_payload(blocks, []))
    assert len(out) == 1
    d = out[0]
    # DetectResultGenerator contract: full-frame dummy, score -1.0
    assert d["dummy"] and d["score"] == -1.0 and d["category"] == "line"
    assert (d["x0"], d["top"], d["x1"], d["bottom"]) == (50.0, 40.0, 550.0, 140.0)


def test_sub_layout_pad_inverts_exactly():
    from deepdoctection_ray.stages.sub_layout import sub_layouts_for_payload

    blocks = [{"block_id": 0, "category": "table", "x0": 100, "top": 100, "x1": 300, "bottom": 200}]
    words = [{"text": "a", "x0": 110, "top": 120, "x1": 160, "bottom": 132}]
    unpadded = sub_layouts_for_payload(_payload(blocks, words), pad=0.0)
    padded = sub_layouts_for_payload(_payload(blocks, words), pad=10.0)
    a = [d for d in unpadded if not d["dummy"]][0]
    b = [d for d in padded if not d["dummy"]][0]
    assert (a["x0"], a["top"], a["x1"], a["bottom"]) == (b["x0"], b["top"], b["x1"], b["bottom"])


def test_sub_layouter_stage_matches_truth(ray_session):
    """Distributed stage output ≡ construction truth for the fixture corpus."""
    import ray.data
    from deepdoctection_ray.stages.sub_layout import SubImageLayouter
    from deepdoctection_ray.synth import make_subimage_docs

    docs, truth = make_subimage_docs(40, seed=5)
    out = (
        ray.data.from_arrow(docs)
        .map_batches(SubImageLayouter, batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
    )
    tr = truth.to_pandas()
    key = ["doc_id", "parent_block", "child_idx"]
    out = out.sort_values(key).reset_index(drop=True)
    tr = tr.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[tr.columns], tr, check_dtype=True)
