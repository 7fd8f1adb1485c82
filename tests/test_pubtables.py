"""Pubtables segmentation kernels: spans, tiling, HTML — hand-built fixtures
mirroring the reference's test shapes (tests/pipe/test_segment.py,
test_refine.py: stretch/tile/intersection/spanning/html)."""

from __future__ import annotations

import numpy as np
import pytest

from deepdoctection_ray.kernels.pubtables import (
    assign_spanning_cells,
    enumerate_items,
    html_with_spans,
    intersection_cells,
    remove_overlapping_items,
    resolve_double_allocation,
    segment_pubtables_payload,
    stretch_items,
    tile_items,
)

TABLE = np.array([0.0, 0.0, 200.0, 100.0])
ROWS = np.array([[5.0, 2.0, 190.0, 48.0], [4.0, 52.0, 195.0, 99.0]])
COLS = np.array([[2.0, 3.0, 98.0, 97.0], [102.0, 2.0, 198.0, 98.0]])


def test_stretch_items_insets_one_pixel_from_table_edges():
    """Reference convention (segment.py:186-189, pinned by the reference's own
    test_stretch_items expected values): stretched edges sit at table ±1."""
    rows, cols = stretch_items(ROWS, COLS, TABLE)
    assert (rows[:, 0] == 1.0).all() and (rows[:, 2] == 199.0).all()
    assert (cols[:, 1] == 1.0).all() and (cols[:, 3] == 99.0).all()
    # the stacking axis is untouched
    assert rows[0, 1] == 2.0 and rows[0, 3] == 48.0


def test_stretch_matches_reference_fixture_expectations():
    """The reference's test_segment.py::test_stretch_items geometry, absolute
    frame: table (100,100,200,400); stretched rows land at x = 101 / 199."""
    import numpy as np

    table = np.array([100.0, 100.0, 200.0, 400.0])
    refs_rows = np.array([[115.0, 300.0, 160.0, 350.0], [115.0, 400.0, 170.0, 440.0]])
    rows, _ = stretch_items(refs_rows, np.empty((0, 4)), table)
    assert (rows[:, 0] == 101.0).all() and (rows[:, 2] == 199.0).all()


def test_tile_items_left_rule_closes_gaps():
    rows, _ = stretch_items(ROWS, COLS, TABLE)
    tiled = tile_items(rows, 1, 0.0, 100.0, "left")
    assert tiled[0, 1] == 1.0 and tiled[1, 3] == 99.0  # one-pixel table inset
    assert tiled[1, 1] == tiled[0, 3]  # next.lo == cur.hi


def test_tile_items_equal_rule_meets_at_midpoint():
    rows, _ = stretch_items(ROWS, COLS, TABLE)
    tiled = tile_items(rows, 1, 0.0, 100.0, "equal")
    assert tiled[0, 3] == tiled[1, 1] == (48.0 + 52.0) / 2.0


def test_enumerate_is_center_order_not_input_order():
    shuffled = ROWS[::-1].copy()
    nums = enumerate_items(shuffled, 1)
    assert nums.tolist() == [2, 1]


def test_remove_overlapping_items_drops_near_duplicate():
    boxes = np.array([[0.0, 0.0, 100.0, 50.0], [0.0, 2.0, 100.0, 52.0], [0.0, 60.0, 100.0, 100.0]])
    keep = remove_overlapping_items(boxes, iou_threshold=0.8)
    assert keep.tolist() == [0, 2]


def test_intersection_cells_grid():
    rows, cols = stretch_items(ROWS, COLS, TABLE)
    boxes, r_num, c_num = intersection_cells(rows, np.array([1, 2]), cols, np.array([1, 2]))
    assert boxes.shape == (4, 4)
    assert r_num.tolist() == [1, 1, 2, 2]
    assert c_num.tolist() == [1, 2, 1, 2]


def test_spanning_assignment_min_number_and_span():
    rows, cols = stretch_items(ROWS, COLS, TABLE)
    rows = tile_items(rows, 1, 0.0, 100.0)
    cols = tile_items(cols, 0, 0.0, 200.0)
    span = np.array([[0.0, 0.0, 200.0, 50.0]])  # covers row 1, both columns
    out = assign_spanning_cells(span, rows, np.array([1, 2]), cols, np.array([1, 2]))
    assert out.tolist() == [[1, 1, 1, 2]]


def test_double_allocation_spanning_wins():
    simple = np.array([[1, 1, 1, 1], [1, 2, 1, 1], [2, 1, 1, 1], [2, 2, 1, 1]])
    spanning = np.array([[1, 1, 1, 2]])
    keep = resolve_double_allocation(simple, spanning)
    assert keep.tolist() == [False, False, True, True]


def test_html_with_spans_reference_format():
    cells = [(1, 1, 1, 2), (2, 1, 1, 1), (2, 2, 1, 1)]
    html = html_with_spans(cells, 2, 2)
    assert html == "<table><tr><td colspan=2></td></tr><tr><td></td><td></td></tr></table>"


def test_html_rowspan_skips_filled_position():
    cells = [(1, 1, 2, 1), (1, 2, 1, 1), (2, 2, 1, 1)]
    html = html_with_spans(cells, 2, 2)
    assert html == "<table><tr><td rowspan=2></td><td></td></tr><tr><td></td></tr></table>"


def test_full_payload_pass():
    span = np.array([[0.0, 0.0, 200.0, 50.0]])
    res = segment_pubtables_payload(TABLE, ROWS, COLS, span, threshold_rows=0.3, threshold_cols=0.3)
    assert res["n_rows"] == 2 and res["n_cols"] == 2
    assert res["cells"] == [(1, 1, 1, 2), (2, 1, 1, 1), (2, 2, 1, 1)]
    assert "colspan=2" in res["html"]


def test_refine_merges_double_allocated_cells():
    """refine.py docstring case: two cells on the same tile merge to one."""
    from deepdoctection_ray.kernels.table_segment import refine_cells

    out = refine_cells([(1, 1, 1, 1), (1, 1, 1, 1), (2, 1, 1, 1)])
    assert out == [(1, 1, 1, 1), (2, 1, 1, 1)]


def test_refine_keeps_clean_tiling():
    from deepdoctection_ray.kernels.table_segment import refine_cells

    cells = [(1, 1, 1, 2), (2, 1, 1, 1), (2, 2, 1, 1)]
    assert refine_cells(cells) == sorted(cells)


def test_refine_closes_l_shape_to_rectangle():
    """The docstring's full-merge case: an L-shaped component swallows the
    cell occupying its bounding-rectangle hole — the whole table becomes one
    cell."""
    from deepdoctection_ray.kernels.table_segment import refine_cells

    cells = [(1, 1, 2, 1), (2, 1, 1, 2), (1, 2, 1, 1)]
    assert refine_cells(cells) == [(1, 1, 2, 2)]


def test_refine_absorbs_bare_hole():
    from deepdoctection_ray.kernels.table_segment import refine_cells

    # L-shaped single component with an unoccupied hole: rectangle closure
    # absorbs the empty tile rather than leaving a non-rectangular cell
    cells = [(1, 1, 2, 1), (2, 1, 1, 2)]
    assert refine_cells(cells) == [(1, 1, 2, 2)]


def test_classic_segmentation_matches_reference_fixture():
    """The reference's TestTableSegmentationService::test_pass_datapoint
    fixture (tests/conftest.py:56-145, table-local frame): cells 1-4 land at
    (row, col) = (1,1), (2,1), (1,2), (2,2) with rs=cs=1; the stray cell 5
    touches no stretched row/column and gets all zeros
    (dp_image_fully_segmented expectations, conftest.py:239-300)."""
    import numpy as np

    from deepdoctection_ray.kernels.table_segment import segment_cells_by_intersection

    table = np.array([0.0, 0.0, 100.0, 300.0])
    cells = np.array(
        [
            [10.0, 100.0, 20.0, 150.0],
            [10.0, 200.0, 20.0, 250.0],
            [40.0, 100.0, 50.0, 150.0],
            [40.0, 200.0, 50.0, 250.0],
            [80.0, 260.0, 90.0, 280.0],
        ]
    )
    rows = np.array([[15.0, 100.0, 60.0, 150.0], [15.0, 200.0, 70.0, 240.0]])
    cols = np.array([[10.0, 50.0, 20.0, 250.0], [40.0, 20.0, 50.0, 240.0]])
    res = segment_cells_by_intersection(
        cells, rows, cols, table, segment_rule="iou",
        threshold_rows=0.001, threshold_cols=0.001, tile=False,
    )
    assert res["row_num"].tolist() == [1, 2, 1, 2, 0]
    assert res["col_num"].tolist() == [1, 1, 2, 2, 0]
    assert res["rs"].tolist() == [1, 1, 1, 1, 0]
    assert res["cs"].tolist() == [1, 1, 1, 1, 0]


def test_classic_segmentation_weighted_ioa_rule():
    """ioa branch: a cell straddling two rows (ioa 0.5 each) still matches
    both because the intersection-count weighting doubles the score
    (match.py:152-162 semantics) — row_num = min, rs = count."""
    import numpy as np

    from deepdoctection_ray.kernels.table_segment import segment_cells_by_intersection

    table = np.array([0.0, 0.0, 100.0, 100.0])
    rows = np.array([[5.0, 0.0, 95.0, 50.0], [5.0, 50.0, 95.0, 100.0]])
    cols = np.array([[10.0, 5.0, 90.0, 95.0]])
    cells = np.array([[20.0, 25.0, 40.0, 75.0]])  # half in row 1, half in row 2
    res = segment_cells_by_intersection(
        cells, rows, cols, table, segment_rule="ioa",
        threshold_rows=0.9, threshold_cols=0.9, tile=False,
    )
    # raw ioa per row = 0.5 < 0.9, weighted = 0.5 * 2 = 1.0 > 0.9 → both match
    assert res["row_num"].tolist() == [1]
    assert res["rs"].tolist() == [2]
    assert res["col_num"].tolist() == [1] and res["cs"].tolist() == [1]


@pytest.mark.parametrize(
    "tiles,expected",
    [
        (  # reference test_refine.py case 1: clean tiling, nothing merges
            [((1, 1), "a"), ((1, 2), "b"), ((1, 3), "b"), ((2, 1), "c"), ((2, 2), "d"),
             ((2, 3), "e"), ((3, 1), "f"), ((3, 2), "f"), ((3, 3), "f")],
            [{"d"}, {"e"}, {"f"}, {"b"}, {"a"}, {"c"}],
        ),
        (  # case 2: row-2 cells shadowed by a full-row cell merge together
            [((1, 1), "a"), ((1, 2), "b"), ((1, 3), "b"), ((2, 1), "c"), ((2, 2), "d"),
             ((2, 3), "e"), ((2, 1), "f"), ((2, 2), "f"), ((2, 3), "f")],
            [{"a"}, {"f", "c", "d", "e"}, {"b"}],
        ),
        (  # case 3: chained double allocations collapse the whole table
            [((1, 1), "a"), ((1, 2), "b"), ((1, 2), "c"), ((2, 1), "d"), ((2, 2), "e"),
             ((2, 2), "c"), ((2, 1), "f"), ((2, 2), "f"), ((2, 2), "f")],
            [{"a", "c", "d", "e", "b", "f"}],
        ),
    ],
)
def test_rectangle_cell_groups_reference_cases(tiles, expected):
    """The reference's test_rectangle_cell_tiling parametrizations verbatim
    (tests/pipe/test_refine.py:48-94)."""
    from deepdoctection_ray.kernels.table_segment import rectangle_cell_groups

    got = rectangle_cell_groups(tiles)
    for el in expected:
        assert el in got, (el, got)
    for el in got:
        assert el in expected, (el, expected)


def test_html_matches_reference_generate_html_string():
    """The reference's test_generate_html_string fixture
    (tests/pipe/test_refine.py:216-260) rendered through html_with_spans."""
    cells = [
        (1, 1, 1, 1), (1, 2, 1, 2),
        (2, 1, 2, 1), (2, 2, 1, 1), (2, 3, 1, 1),
        (3, 2, 1, 1), (3, 3, 1, 1),
        (4, 1, 1, 1), (4, 2, 1, 2),
    ]
    texts = ["a", "b", "c", "d", "e", "f", "g", "h", "i"]
    html = html_with_spans(cells, 4, 3, texts=texts)
    assert html == (
        "<table>"
        "<tr><td>a</td><td colspan=2>b</td></tr>"
        "<tr><td rowspan=2>c</td><td>d</td><td>e</td></tr>"
        "<tr><td>f</td><td>g</td></tr>"
        "<tr><td>h</td><td colspan=2>i</td></tr>"
        "</table>"
    )
