"""F5 — geometry invariants, incl. hypothesis property tests mirroring
``dd_core/tests/datapoint/box/test_box_transform.py`` round-trips."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deepdoctection_ray.kernels import boxes as B


def test_rounding_rules():
    # half-down for upper-left, half-up for lower-right (box.py:206-212)
    assert B.round_half_down(10.5) == 10
    assert B.round_half_down(10.51) == 11
    assert B.round_half_up(10.5) == 11
    assert B.round_half_up(10.49) == 10
    snapped = B.snap_abs(np.array([[10.5, 10.51, 20.5, 20.49]]))
    assert snapped.tolist() == [[10.0, 11.0, 21.0, 20.0]]


def test_ioa_convention():
    big = np.array([[0.0, 0.0, 10.0, 10.0]])
    small = np.array([[0.0, 0.0, 5.0, 10.0]])
    # ioa(a, b) = inter / area(b)
    assert B.ioa_matrix(big, small)[0, 0] == 1.0
    assert B.ioa_matrix(small, big)[0, 0] == 0.5


def test_iou_symmetric():
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    b = np.array([[5.0, 5.0, 15.0, 15.0]])
    assert np.allclose(B.iou_matrix(a, b), B.iou_matrix(b, a).T)
    assert np.isclose(B.iou_matrix(a, b)[0, 0], 25.0 / 175.0)


boxes_strategy = st.tuples(
    st.floats(0, 500), st.floats(0, 500), st.floats(1, 400), st.floats(1, 400)
).map(lambda t: [t[0], t[1], t[0] + t[2], t[1] + t[3]])


@settings(max_examples=50, deadline=None)
@given(st.lists(boxes_strategy, min_size=1, max_size=8))
def test_merge_contains_inputs(raw):
    arr = np.array(raw)
    m = B.merge(arr)
    assert (m[0] <= arr[:, 0]).all() and (m[1] <= arr[:, 1]).all()
    assert (m[2] >= arr[:, 2]).all() and (m[3] >= arr[:, 3]).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(boxes_strategy, min_size=1, max_size=8))
def test_abs_rel_roundtrip_within_rounding(raw):
    w, h = 1000.0, 900.0
    arr = B.snap_abs(np.array(raw))
    back = B.to_absolute(B.to_relative(arr, w, h), w, h)
    # round trip through the 1e-8 relative grid is exact at pixel resolution
    assert np.abs(back - np.clip(arr, 0, [w, h, w, h])).max() <= 1.0


@settings(max_examples=50, deadline=None)
@given(st.lists(boxes_strategy, min_size=2, max_size=6))
def test_intersection_box_subset(raw):
    arr = np.array(raw)
    inter = B.intersection_box(arr[0], arr[1])
    if inter is not None:
        assert inter[0] >= min(arr[0][0], arr[1][0])
        assert inter[2] <= max(arr[0][2], arr[1][2])
        assert (inter[2:] >= inter[:2]).all()
