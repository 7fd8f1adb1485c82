"""Table segmentation: cell boxes → (row, col) grid → CSV / HTML skeleton.

Rule-based re-expression of the reference's table stack
(``pipe/segment.py:840-1053`` cell→row/col assignment by intersection,
``pipe/refine.py:412-581`` grid tiling + HTML skeleton,
``view.py:830-874`` ``Table.csv`` and ``view.py:786-820`` ``Table.html``):

- row bands form greedily over cells sorted by vertical center (a cell joins
  the first band containing its center; the first cell fixes the band — the
  same banding idea as ``group_words_into_lines``, applied to cells like the
  reference applies ioa against stretched row items);
- column bands likewise over horizontal centers;
- the grid is (n_rows x n_cols); multi-cell collisions keep the first cell
  (reference tiling refinement collapses duplicates); missing tiles are empty
  strings — ``Table.csv`` emits ``""`` for absent cells;
- cells read in (row, col) order (``view.py:951``).
"""

from __future__ import annotations

import numpy as np


def _band_assign(lo: np.ndarray, hi: np.ndarray) -> list[int]:
    """Greedy 1-D banding: rank each interval into bands ordered by position."""
    n = len(lo)
    center = (lo + hi) / 2.0
    order = sorted(range(n), key=lambda i: (center[i], lo[i]))
    bands: list[tuple[float, float]] = []
    assign: dict[int, int] = {}
    for i in order:
        placed = False
        for b, (blo, bhi) in enumerate(bands):
            if blo <= center[i] <= bhi:
                assign[i] = b
                placed = True
                break
        if not placed:
            bands.append((lo[i], hi[i]))
            assign[i] = len(bands) - 1
    # bands were created in position order (cells scanned by center), so the
    # band index already ranks top-to-bottom / left-to-right
    return [assign[i] for i in range(n)]


def segment_cells(cell_boxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Assign 0-based (row, col) numbers to each cell box.

    Returns ``(rows, cols)`` int arrays aligned with ``cell_boxes``.
    """
    if cell_boxes.shape[0] == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    rows = np.array(_band_assign(cell_boxes[:, 1], cell_boxes[:, 3]), dtype=np.int64)
    cols = np.array(_band_assign(cell_boxes[:, 0], cell_boxes[:, 2]), dtype=np.int64)
    return rows, cols


def grid_from_cells(cell_texts: list[str], rows: np.ndarray, cols: np.ndarray) -> list[list[str]]:
    """Tile the (row, col) assignments into a dense grid of cell texts."""
    if len(cell_texts) == 0:
        return []
    n_rows = int(rows.max()) + 1
    n_cols = int(cols.max()) + 1
    grid = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    for text, r, c in zip(cell_texts, rows, cols):
        if not grid[r][c]:  # first cell wins a contested tile
            grid[r][c] = text
    return grid


def grid_to_csv(grid: list[list[str]]) -> str:
    """``Table.csv`` shape (``view.py:830-874``): rows of comma-joined texts."""
    return "\n".join(",".join(row) for row in grid)


def grid_to_html(grid: list[list[str]]) -> str:
    """Minimal HTML skeleton (``refine.py:235-408`` emits the same structure)."""
    body = "".join(
        "<tr>" + "".join(f"<td>{cell}</td>" for cell in row) + "</tr>" for row in grid
    )
    return f"<table>{body}</table>"


def segment_table_payload(
    cell_boxes: np.ndarray, cell_texts: list[str]
) -> dict:
    """Full table pass: boxes+texts → grid dict (n_rows, n_cols, csv, html)."""
    rows, cols = segment_cells(cell_boxes)
    grid = grid_from_cells(cell_texts, rows, cols)
    return {
        "n_rows": len(grid),
        "n_cols": len(grid[0]) if grid else 0,
        "csv": grid_to_csv(grid),
        "html": grid_to_html(grid),
    }


def refine_cells(cells: list[tuple[int, int, int, int]]) -> list[tuple[int, int, int, int]]:
    """``TableSegmentationRefinementService`` rectangle refinement
    (``pipe/refine.py:412-581`` with helpers :51-232; the networkx connected
    components are a union-find here):

    1. every cell occupies its (row..row+rs) x (col..col+cs) tile footprint
       (``tiles_to_cells``);
    2. cells sharing a tile join one component (``connected_component_tiles``);
    3. components close to rectangles: while a component's bounding rectangle
       contains a tile it does not own, the owner (another component, or the
       bare hole) merges in (``generate_rectangle_tiling`` fixed point);
    4. each final component becomes ONE merged cell at its bounding-rectangle
       position (``_tiling_to_cell_position``) — the number of rows/columns
       never changes, only the number of cells.

    ``cells`` are 1-based ``(row, col, rs, cs)``; output is sorted (row, col).
    """
    n = len(cells)
    if n == 0:
        return []
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    tile_owner: dict[tuple[int, int], int] = {}
    for idx, (r, c, rs, cs) in enumerate(cells):
        for k in range(rs):
            for l in range(cs):
                tile = (r + k, c + l)
                if tile in tile_owner:
                    union(tile_owner[tile], idx)
                else:
                    tile_owner[tile] = idx

    comp_tiles: dict[int, set[tuple[int, int]]] = {}
    for tile, idx in tile_owner.items():
        comp_tiles.setdefault(find(idx), set()).add(tile)
    comps = list(comp_tiles.values())

    changed = True
    while changed:
        changed = False
        for i, tiles in enumerate(comps):
            rows = [t[0] for t in tiles]
            cols = [t[1] for t in tiles]
            rect = {
                (r, c)
                for r in range(min(rows), max(rows) + 1)
                for c in range(min(cols), max(cols) + 1)
            }
            missing = rect - tiles
            if not missing:
                continue
            hole = next(iter(missing))
            other = next((j for j, t in enumerate(comps) if j != i and hole in t), None)
            if other is not None:
                comps[i] = tiles | comps[other]
                del comps[other]
            else:
                comps[i] = tiles | {hole}  # bare hole absorbed into the rectangle
            changed = True
            break

    out = []
    for tiles in comps:
        rows = [t[0] for t in tiles]
        cols = [t[1] for t in tiles]
        out.append(
            (min(rows), min(cols), max(rows) - min(rows) + 1, max(cols) - min(cols) + 1)
        )
    return sorted(out)


def segment_cells_by_intersection(
    cell_boxes: np.ndarray,
    row_boxes: np.ndarray,
    col_boxes: np.ndarray,
    table_box: np.ndarray,
    segment_rule: str = "iou",
    threshold_rows: float = 0.001,
    threshold_cols: float = 0.001,
    tile: bool = False,
    stretch_rule: str = "left",
    remove_iou_threshold: float = 0.001,
) -> dict:
    """The classic ``TableSegmentationService`` cell assignment
    (``pipe/segment.py:475-585`` + ``:1040-1053`` serve order), exactly:

    1. rows/columns stretch to one pixel inside the table
       (``stretch_item_per_table``), overlapping items above the iou
       threshold are removed, optional tiling;
    2. items are numbered 1..n by box-center order;
    3. every cell matches rows/columns by STRICT ``> threshold`` iou — or
       intersection-count-WEIGHTED ioa (``match.py:152-162``);
    4. per cell: ``row_number`` = MIN matched row number (0 when nothing
       matches), ``rs`` = COUNT of matched rows (not max-min+1 — the classic
       service counts intersections, ``segment.py:552-558``), columns
       analogously.

    Returns ``{"row_num", "col_num", "rs", "cs"}`` int arrays aligned with
    ``cell_boxes``.
    """
    from .boxes import ioa_matrix, iou_matrix
    from .pubtables import (
        AXIS_COL,
        AXIS_ROW,
        enumerate_items,
        remove_overlapping_items,
        stretch_items,
        tile_items,
    )

    rows, cols = stretch_items(row_boxes, col_boxes, table_box)
    if rows.size:
        rows = rows[remove_overlapping_items(rows, remove_iou_threshold)]
    if cols.size:
        cols = cols[remove_overlapping_items(cols, remove_iou_threshold)]
    if tile:
        rows = tile_items(rows, AXIS_ROW, table_box[1], table_box[3], stretch_rule)
        cols = tile_items(cols, AXIS_COL, table_box[0], table_box[2], stretch_rule)
    row_nums = enumerate_items(rows, AXIS_ROW)
    col_nums = enumerate_items(cols, AXIS_COL)

    n = cell_boxes.shape[0]
    out = {k: np.zeros(n, dtype=np.int64) for k in ("row_num", "col_num", "rs", "cs")}

    def assign(items: np.ndarray, numbers: np.ndarray, num_key: str, span_key: str) -> None:
        if items.shape[0] == 0 or n == 0:
            return
        if segment_rule == "iou":
            mat = iou_matrix(cell_boxes, items)  # [cell, item]
            matches = mat > threshold_rows if num_key == "row_num" else mat > threshold_cols
        else:  # weighted ioa, match.py:152-162
            mat = ioa_matrix(items, cell_boxes).T  # [cell, item] = inter/area(cell)
            weighted = mat * (mat != 0).sum(1, keepdims=True)
            thr = threshold_rows if num_key == "row_num" else threshold_cols
            matches = weighted > thr
        for i in range(n):
            hit = numbers[matches[i]]
            out[span_key][i] = hit.size
            out[num_key][i] = hit.min() if hit.size else 0

    assign(rows, row_nums, "row_num", "rs")
    assign(cols, col_nums, "col_num", "cs")
    return out


def rectangle_cell_groups(
    tile_to_cells: list[tuple[tuple[int, int], str]],
) -> list[set[str]]:
    """Cell-id level rectangle refinement — the exact contract of the
    reference helpers ``connected_component_tiles`` +
    ``generate_rectangle_tiling`` + ``rectangle_cells``
    (``pipe/refine.py:51-232``, networkx replaced by union-find): cells
    sharing a tile join one component; components grow until the cells above
    them form a rectangular scheme; returns the list of cell-id sets to merge.
    """
    if not tile_to_cells:
        return []
    cell_ids = sorted({cid for _, cid in tile_to_cells})
    index = {cid: i for i, cid in enumerate(cell_ids)}
    parent = list(range(len(cell_ids)))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    tile_owners: dict[tuple[int, int], list[int]] = {}
    for tile, cid in tile_to_cells:
        tile_owners.setdefault(tile, []).append(index[cid])
    for occupants in tile_owners.values():
        for other in occupants[1:]:
            union(occupants[0], other)

    comp_tiles: dict[int, set[tuple[int, int]]] = {}
    comp_cells: dict[int, set[str]] = {}
    for tile, occupants in tile_owners.items():
        for occ in occupants:
            root = find(occ)
            comp_tiles.setdefault(root, set()).add(tile)
            comp_cells.setdefault(root, set()).add(cell_ids[occ])
    tiles_list = list(comp_tiles.values())
    cells_list = [comp_cells[k] for k in comp_tiles]

    changed = True
    while changed:
        changed = False
        for i, tiles in enumerate(tiles_list):
            rows = [t[0] for t in tiles]
            cols = [t[1] for t in tiles]
            rect = {
                (r, c)
                for r in range(min(rows), max(rows) + 1)
                for c in range(min(cols), max(cols) + 1)
            }
            missing = rect - tiles
            if not missing:
                continue
            hole = next(iter(sorted(missing)))
            other = next((j for j, t in enumerate(tiles_list) if j != i and hole in t), None)
            if other is not None:
                tiles_list[i] = tiles | tiles_list[other]
                cells_list[i] = cells_list[i] | cells_list[other]
                del tiles_list[other]
                del cells_list[other]
            else:
                tiles_list[i] = tiles | {hole}
            changed = True
            break
    return cells_list
