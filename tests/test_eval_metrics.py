"""Real TEDS (Zhang-Shasha) and multi-IoU mAP (functions/eval_extras.py) —
known-value fixtures mirroring eval/tedsmetric.py and eval/cocometric.py."""

from __future__ import annotations

import numpy as np
import pytest

from deepdoctection_ray.functions.eval_extras import coco_map, parse_table_html, teds


def test_teds_identical_is_one():
    html = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
    assert teds(html, html) == 1.0


def test_teds_one_cell_text_changed():
    gt = "<table><tr><td>ab</td><td>cd</td></tr></table>"
    pred = "<table><tr><td>ab</td><td>cx</td></tr></table>"
    # tree: table + tr + 2 td = 3 descendants; one rename at cost
    # levenshtein(['c','d'],['c','x'])/2 = 0.5 → 1 - 0.5/3
    assert teds(gt, pred) == pytest.approx(1 - 0.5 / 3)


def test_teds_missing_cell_costs_one_delete():
    gt = "<table><tr><td>a</td><td>b</td></tr></table>"
    pred = "<table><tr><td>a</td></tr></table>"
    # descendants(gt) = 3; one td deleted → 1 - 1/3
    assert teds(gt, pred) == pytest.approx(1 - 1 / 3)


def test_teds_span_mismatch_is_full_rename():
    gt = "<table><tr><td colspan=2>a</td></tr></table>"
    pred = "<table><tr><td>a</td></tr></table>"
    assert teds(gt, pred) == pytest.approx(1 - 1 / 2)


def test_teds_structure_only_ignores_text():
    gt = "<table><tr><td>hello</td></tr></table>"
    pred = "<table><tr><td>world</td></tr></table>"
    assert teds(gt, pred, structure_only=True) == 1.0
    assert teds(gt, pred) < 1.0


def test_parse_spans():
    root = parse_table_html("<table><tr><td rowspan=2 colspan=3>x</td></tr></table>")
    td = root.children[0].children[0]
    assert (td.rowspan, td.colspan) == (2, 3)
    assert td.content == ["x"]


def test_coco_map_perfect_detection():
    gt = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]], dtype=float)]
    pred = [gt[0].copy()]
    scores = [np.array([0.9, 0.8])]
    res = coco_map(gt, pred, scores)
    assert res["map"] == 1.0 and res["ap50"] == 1.0


def test_coco_map_halfway_overlap_drops_high_thresholds():
    gt = [np.array([[0, 0, 10, 10]], dtype=float)]
    pred = [np.array([[0, 0, 10, 5]], dtype=float)]  # IoU 0.5
    scores = [np.array([0.9])]
    res = coco_map(gt, pred, scores)
    assert res["ap50"] == 1.0  # matches exactly at 0.5
    assert res["ap75"] == 0.0
    assert 0.0 < res["map"] < 1.0


def test_coco_map_false_positive_lowers_precision():
    gt = [np.array([[0, 0, 10, 10]], dtype=float)]
    pred = [np.array([[0, 0, 10, 10], [50, 50, 60, 60]], dtype=float)]
    scores = [np.array([0.6, 0.9])]  # FP ranked HIGHER than the TP
    res = coco_map(gt, pred, scores)
    # precision at recall 1.0 is 1/2; 101-pt AP = 0.5
    assert res["ap50"] == pytest.approx(0.5, abs=0.01)
