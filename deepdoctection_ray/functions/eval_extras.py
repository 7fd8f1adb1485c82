"""Evaluation metrics: TEDS tree-edit table similarity, COCO-style mAP,
single-threshold detection PR.

- :func:`teds` — REAL tree-edit-distance TEDS (``eval/tedsmetric.py:110-233``
  semantics, itself from the public PubTabNet metric): HTML table → tag tree
  with td rowspan/colspan + cell content; Zhang-Shasha tree edit distance
  (public 1989 algorithm, replacing the APTED dependency) with the
  reference's cost model — rename 1.0 on tag/span mismatch, normalized
  Levenshtein of cell content otherwise; score = 1 - dist / max(#nodes).
- :func:`coco_map` — multi-IoU-threshold mAP (``eval/cocometric.py``
  semantics): greedy score-descending per-image matching, 101-point
  interpolated AP per threshold, averaged over thresholds 0.50:0.95:0.05.
- :func:`table_similarity` — retained grid-agreement TEDS-lite (cheap batch
  screen; :func:`teds` is the faithful metric).
- :func:`detection_metrics` — single-threshold precision/recall/F1.
"""

from __future__ import annotations

from html.parser import HTMLParser

import numpy as np

from ..kernels import boxes as B

# ------------------------------------------------------------------- TEDS


class _TableNode:
    __slots__ = ("tag", "rowspan", "colspan", "content", "children")

    def __init__(self, tag: str, rowspan=None, colspan=None, content=None):
        self.tag = tag
        self.rowspan = rowspan
        self.colspan = colspan
        self.content = content
        self.children: list[_TableNode] = []


class _TableHTMLParser(HTMLParser):
    """<table>/<tr>/<td> (+ thead/tbody passthrough) → _TableNode tree; cell
    content is the character token list the reference's tokenize() builds."""

    def __init__(self) -> None:
        super().__init__()
        self.root: _TableNode | None = None
        self._stack: list[_TableNode] = []
        self._td_depth = 0

    def handle_starttag(self, tag, attrs):
        if self._td_depth:
            # nested markup inside a cell contributes its tag tokens
            self._stack[-1].content.append(f"<{tag}>")
            if tag == "td":
                self._td_depth += 1
            return
        if tag == "td":
            a = dict(attrs)
            node = _TableNode(
                "td",
                rowspan=int(a.get("rowspan", 1)),
                colspan=int(a.get("colspan", 1)),
                content=[],
            )
            self._attach(node)
            self._stack.append(node)
            self._td_depth = 1
        elif tag in ("table", "tr", "thead", "tbody"):
            node = _TableNode(tag)
            self._attach(node)
            self._stack.append(node)

    def handle_endtag(self, tag):
        if self._td_depth:
            if tag == "td":
                self._td_depth -= 1
                if self._td_depth == 0:
                    self._stack.pop()
                    return
            self._stack[-1].content.append(f"</{tag}>")
            return
        if self._stack and tag in ("table", "tr", "thead", "tbody"):
            self._stack.pop()

    def handle_data(self, data):
        if self._td_depth and data:
            self._stack[-1].content.extend(list(data))

    def _attach(self, node: _TableNode) -> None:
        if self._stack:
            self._stack[-1].children.append(node)
        elif self.root is None:
            self.root = node


def parse_table_html(html: str) -> _TableNode | None:
    p = _TableHTMLParser()
    p.feed(html)
    return p.root


def _levenshtein(a: list[str], b: list[str]) -> int:
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def _rename_cost(n1: _TableNode, n2: _TableNode, structure_only: bool) -> float:
    """Reference CustomConfig.rename (``tedsmetric.py:86-108``)."""
    if n1.tag != n2.tag or n1.colspan != n2.colspan or n1.rowspan != n2.rowspan:
        return 1.0
    if n1.tag == "td" and not structure_only:
        c1, c2 = n1.content or [], n2.content or []
        if c1 or c2:
            return _levenshtein(c1, c2) / max(len(c1), len(c2))
    return 0.0


def _tree_edit_distance(t1: _TableNode, t2: _TableNode, structure_only: bool) -> float:
    """Zhang-Shasha ordered tree edit distance (unit insert/delete, rename
    per the TEDS cost model)."""

    def postorder(root):
        nodes, lml = [], []

        def walk(n):
            first = None
            for ch in n.children:
                idx = walk(ch)
                if first is None:
                    first = lml[idx]
            nodes.append(n)
            lml.append(first if first is not None else len(nodes) - 1)
            return len(nodes) - 1

        walk(root)
        return nodes, lml

    n1, l1 = postorder(t1)
    n2, l2 = postorder(t2)
    kr1 = _keyroots(l1)
    kr2 = _keyroots(l2)
    td = np.zeros((len(n1), len(n2)))

    for i in kr1:
        for j in kr2:
            _treedist(i, j, n1, n2, l1, l2, td, structure_only)
    return float(td[len(n1) - 1, len(n2) - 1])


def _keyroots(lml: list[int]) -> list[int]:
    seen: dict[int, int] = {}
    for i, l in enumerate(lml):
        seen[l] = i  # last (largest) index per leftmost-leaf wins
    return sorted(seen.values())


def _treedist(i, j, n1, n2, l1, l2, td, structure_only):
    li, lj = l1[i], l2[j]
    m, n = i - li + 2, j - lj + 2
    fd = np.zeros((m, n))
    for x in range(1, m):
        fd[x, 0] = fd[x - 1, 0] + 1
    for y in range(1, n):
        fd[0, y] = fd[0, y - 1] + 1
    for x in range(1, m):
        for y in range(1, n):
            gi, gj = li + x - 1, lj + y - 1
            if l1[gi] == li and l2[gj] == lj:
                cost = _rename_cost(n1[gi], n2[gj], structure_only)
                fd[x, y] = min(fd[x - 1, y] + 1, fd[x, y - 1] + 1, fd[x - 1, y - 1] + cost)
                td[gi, gj] = fd[x, y]
            else:
                p, q = l1[gi] - li, l2[gj] - lj
                fd[x, y] = min(fd[x - 1, y] + 1, fd[x, y - 1] + 1, fd[p, q] + td[gi, gj])


def teds(gt_html: str, pred_html: str, structure_only: bool = False) -> float:
    """TEDS similarity in [0, 1]; 1.0 = identical tables
    (``tedsmetric.py:155-200`` flow: parse both, distance, normalize by the
    larger DESCENDANT count — the root <table> is excluded like lxml's
    ``.//*``)."""
    if not gt_html or not pred_html:
        return 0.0
    t_gt = parse_table_html(gt_html)
    t_pr = parse_table_html(pred_html)
    if t_gt is None or t_pr is None:
        return 0.0

    def count(n):
        return 1 + sum(count(c) for c in n.children)

    n_nodes = max(count(t_gt) - 1, count(t_pr) - 1)
    if n_nodes == 0:
        return 1.0 if count(t_gt) == count(t_pr) else 0.0
    dist = _tree_edit_distance(t_gt, t_pr, structure_only)
    return max(0.0, 1.0 - dist / n_nodes)


# --------------------------------------------------------------------- mAP


def coco_map(
    gt_per_image: list[np.ndarray],
    pred_per_image: list[np.ndarray],
    scores_per_image: list[np.ndarray],
    iou_thresholds: np.ndarray | None = None,
) -> dict:
    """Multi-IoU-threshold mean average precision (``eval/cocometric.py``
    semantics — pycocotools single-category protocol): per threshold, greedy
    best-IoU matching in global score order, 101-point interpolated AP;
    reported mAP = mean over 0.50:0.95:0.05, plus AP50 / AP75."""
    if iou_thresholds is None:
        iou_thresholds = np.arange(0.5, 1.0, 0.05)
    n_gt_total = int(sum(g.shape[0] for g in gt_per_image))
    aps = []
    for thr in iou_thresholds:
        records = []  # (score, is_tp)
        for gt, pred, scores in zip(gt_per_image, pred_per_image, scores_per_image):
            if pred.shape[0] == 0:
                continue
            order = np.argsort(-scores, kind="stable")
            taken = np.zeros(gt.shape[0], dtype=bool)
            iou = B.iou_matrix(pred, gt) if gt.shape[0] else np.zeros((pred.shape[0], 0))
            for p in order:
                tp = False
                if gt.shape[0]:
                    cand = np.where(~taken, iou[p], -1.0)
                    best = int(cand.argmax())
                    if cand[best] >= thr:
                        taken[best] = True
                        tp = True
                records.append((float(scores[p]), tp))
        if not records or n_gt_total == 0:
            aps.append(0.0)
            continue
        records.sort(key=lambda t: -t[0])
        tps = np.cumsum([r[1] for r in records])
        fps = np.cumsum([not r[1] for r in records])
        recall = tps / n_gt_total
        precision = tps / np.maximum(tps + fps, 1)
        # 101-point interpolation with monotone precision envelope
        env = np.maximum.accumulate(precision[::-1])[::-1]
        ap = float(
            np.mean([env[recall >= r].max() if (recall >= r).any() else 0.0
                     for r in np.linspace(0, 1, 101)])
        )
        aps.append(ap)
    return {
        "map": round(float(np.mean(aps)), 6),
        "ap50": round(aps[0], 6),
        "ap75": round(aps[5], 6) if len(aps) > 5 else None,
        "per_threshold": [round(a, 6) for a in aps],
    }


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
