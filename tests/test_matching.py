"""F4 — ioa word→block matching (mirrors ``dd_core/tests/mapper/test_match.py``
semantics with the conf_dd_one.yaml defaults) and numpy NMS."""

from __future__ import annotations

import numpy as np

from deepdoctection_ray.kernels.matching import match_by_ioa, match_by_distance, nms


PARENTS = np.array([[0.0, 0.0, 100.0, 100.0], [200.0, 0.0, 300.0, 100.0]])


def test_full_containment_assigns():
    children = np.array([[10.0, 10.0, 20.0, 20.0], [210.0, 10.0, 220.0, 20.0]])
    c, p = match_by_ioa(PARENTS, children)
    assert c.tolist() == [0, 1]
    assert p.tolist() == [0, 1]


def test_below_threshold_is_orphan():
    # word mostly outside both parents: ioa = 25/100 = 0.25 < 0.3
    children = np.array([[95.0, 0.0, 115.0, 5.0]])
    c, p = match_by_ioa(PARENTS, children)
    assert c.tolist() == []


def test_max_parent_only_picks_larger_ioa():
    # straddles both parents; 60% of its width inside parent 2's x-range
    children = np.array([[80.0, 10.0, 230.0, 20.0]])
    # ioa(p0)=20/150≈0.133, ioa(p1)=30/150=0.2 → arg-max parent is 1
    c, p = match_by_ioa(PARENTS, children, threshold=0.1)
    assert c.tolist() == [0]
    assert p.tolist() == [1]


def test_without_max_parent_returns_all_pairs():
    children = np.array([[80.0, 0.0, 230.0, 100.0]])
    c, p = match_by_ioa(PARENTS, children, threshold=0.1, max_parent_only=False)
    assert c.tolist() == [0, 0]
    assert sorted(p.tolist()) == [0, 1]


def test_match_by_distance_nearest_center():
    children = np.array([[0.0, 0.0, 10.0, 10.0], [200.0, 200.0, 210.0, 210.0]])
    parents = np.array([[190.0, 190.0, 220.0, 220.0]])
    assert match_by_distance(parents, children).tolist() == [1]


def test_nms_suppresses_lower_score():
    boxes = np.array([[0.0, 0.0, 10.0, 10.0], [1.0, 1.0, 11.0, 11.0], [50.0, 50.0, 60.0, 60.0]])
    scores = np.array([0.9, 0.8, 0.5])
    keep = nms(boxes, scores, threshold=0.5)
    assert keep.tolist() == [0, 2]


def test_nms_priority_survives():
    boxes = np.array([[0.0, 0.0, 10.0, 10.0], [1.0, 1.0, 11.0, 11.0]])
    scores = np.array([0.9, 0.1])
    prio = np.array([False, True])
    keep = nms(boxes, scores, threshold=0.5, priority_mask=prio)
    assert 1 in keep.tolist()
