"""Extra evaluation metrics: table-structure similarity and box detection PR.

- :func:`table_similarity` — a TEDS-lite: the reference scores predicted
  table HTML against ground truth with tree-edit distance
  (``eval/tedsmetric.py:110-233``); for the rule-grid tables produced by
  ``kernels/table_segment.py`` the tree is exactly a cell grid, so tree-edit
  similarity reduces to aligned-cell agreement over the union grid.
- :func:`detection_metrics` — IoU-matched precision/recall for box
  detections (the single-threshold core of ``eval/cocometric.py``'s mAP;
  greedy score-descending matching at a fixed IoU, the COCO matching rule).
"""

from __future__ import annotations

import numpy as np

from ..kernels import boxes as B


def table_similarity(grid_a: list[list[str]], grid_b: list[list[str]]) -> float:
    """Aligned-cell agreement over the union grid shape, in [0, 1]."""
    if not grid_a and not grid_b:
        return 1.0
    rows = max(len(grid_a), len(grid_b))
    cols = max(
        max((len(r) for r in grid_a), default=0), max((len(r) for r in grid_b), default=0)
    )
    if rows == 0 or cols == 0:
        return 1.0

    def cell(g: list[list[str]], r: int, c: int) -> str:
        return g[r][c] if r < len(g) and c < len(g[r]) else ""

    agree = sum(
        cell(grid_a, r, c) == cell(grid_b, r, c) for r in range(rows) for c in range(cols)
    )
    return agree / (rows * cols)


def detection_metrics(
    gt_boxes: np.ndarray,
    pred_boxes: np.ndarray,
    pred_scores: np.ndarray | None = None,
    iou_threshold: float = 0.5,
) -> dict:
    """Greedy IoU matching (score-descending) → precision/recall/F1.

    Each prediction matches at most one unmatched ground-truth box with
    IoU ≥ threshold — the COCO matching rule at a single threshold.
    """
    n_gt, n_pred = gt_boxes.shape[0], pred_boxes.shape[0]
    if n_pred == 0 or n_gt == 0:
        tp = 0
    else:
        order = (
            np.argsort(-pred_scores, kind="stable") if pred_scores is not None else np.arange(n_pred)
        )
        iou = B.iou_matrix(pred_boxes, gt_boxes)
        taken = np.zeros(n_gt, dtype=bool)
        tp = 0
        for p in order:
            cand = np.where(~taken, iou[p], -1.0)
            best = int(cand.argmax())
            if cand[best] >= iou_threshold:
                taken[best] = True
                tp += 1
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gt if n_gt else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {
        "tp": tp,
        "n_gt": n_gt,
        "n_pred": n_pred,
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        "f1": round(f1, 6),
    }
