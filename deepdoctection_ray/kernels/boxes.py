"""Bounding-box algebra on numpy arrays.

Boxes are ``float64`` arrays of shape ``[N, 4]`` in ``xyxy`` order
(ulx, uly, lrx, lry). The reference stores coordinates as a pydantic object per
box (``dd_core/src/dd_core/datapoint/box.py:215``); we keep whole columns of
boxes as arrays so a turn's geometry is one vectorized kernel call.

Rounding rules are reproduced exactly:

- absolute coords round on construction: upper-left half-DOWN, lower-right
  half-UP (``box.py:206-212``, ``box.py:268-276``);
- relative coords are quantized to a fixed-point grid of 1e-8
  (``RELATIVE_COORD_SCALE_FACTOR``, ``box.py:246``);
- abs→rel transform clips into [0, 1] (``box.py:575-585``).
"""

from __future__ import annotations

import math

import numpy as np

REL_SCALE = 10**8  # box.py:246


def round_half_up(x: float) -> int:
    """``box.py:206-207``."""
    return int(math.floor(x + 0.5))


def round_half_down(x: float) -> int:
    """``box.py:210-212``."""
    f = math.floor(x)
    return int(f if (x - f) <= 0.5 else f + 1)


def snap_abs(boxes: np.ndarray) -> np.ndarray:
    """Apply the reference's construction rounding to absolute boxes.

    ulx/uly half-down, lrx/lry half-up (``box.py:268-276``). Vectorized:
    half-down(x) == -half-up-floor trick: floor(x) if frac<=0.5 else floor+1.
    """
    out = np.empty_like(boxes, dtype=np.float64)
    ul = boxes[:, :2]
    lr = boxes[:, 2:]
    f = np.floor(ul)
    out[:, :2] = np.where((ul - f) <= 0.5, f, f + 1.0)
    out[:, 2:] = np.floor(lr + 0.5)
    return out


def snap_rel(boxes: np.ndarray) -> np.ndarray:
    """Quantize relative boxes to the 1e-8 fixed-point grid (``box.py:277-287``).

    numpy ``rint`` is round-half-to-even, matching Python's ``round`` used by
    the reference for relative coords.
    """
    return np.rint(boxes * REL_SCALE) / REL_SCALE


def to_relative(boxes: np.ndarray, width: float, height: float) -> np.ndarray:
    """abs → rel with clipping into [0,1] then fixed-point quantization
    (``box.py:575-585`` + construction rounding)."""
    rel = np.empty_like(boxes, dtype=np.float64)
    rel[:, 0] = np.clip(boxes[:, 0] / width, 0.0, 1.0)
    rel[:, 1] = np.clip(boxes[:, 1] / height, 0.0, 1.0)
    rel[:, 2] = np.clip(boxes[:, 2] / width, 0.0, 1.0)
    rel[:, 3] = np.clip(boxes[:, 3] / height, 0.0, 1.0)
    return snap_rel(rel)


def to_absolute(boxes: np.ndarray, width: float, height: float) -> np.ndarray:
    """rel → abs with construction rounding (``box.py:586-592``)."""
    out = boxes * np.array([width, height, width, height])
    return snap_abs(out)


def area(boxes: np.ndarray) -> np.ndarray:
    """Box areas, clamped at zero (``box.py:77-93``)."""
    w = np.maximum(boxes[:, 2] - boxes[:, 0], 0.0)
    h = np.maximum(boxes[:, 3] - boxes[:, 1], 0.0)
    return w * h


def intersection_matrix(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise intersection areas, shape [N, M] (``box.py:103-128``)."""
    lo_x = np.maximum(boxes1[:, None, 0], boxes2[None, :, 0])
    lo_y = np.maximum(boxes1[:, None, 1], boxes2[None, :, 1])
    hi_x = np.minimum(boxes1[:, None, 2], boxes2[None, :, 2])
    hi_y = np.minimum(boxes1[:, None, 3], boxes2[None, :, 3])
    return np.maximum(hi_x - lo_x, 0.0) * np.maximum(hi_y - lo_y, 0.0)


def iou_matrix(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise intersection-over-union, shape [N, M] (``box.py:134-150``)."""
    inter = intersection_matrix(boxes1, boxes2)
    union = area(boxes1)[:, None] + area(boxes2)[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / union, 0.0)
    return out


def ioa_matrix(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise intersection-over-area-of-boxes2, shape [N, M] (``box.py:177-193``).

    ``ioa_matrix(a, b)[n, m] = intersection(a_n, b_m) / area(b_m)`` — exactly
    the reference's asymmetric convention.
    """
    inter = intersection_matrix(boxes1, boxes2)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / area(boxes2)
    return inter * inv[None, :]


def merge(boxes: np.ndarray) -> np.ndarray:
    """Smallest box containing all input boxes (``box.py:757-773``), shape [4]."""
    return np.array(
        [boxes[:, 0].min(), boxes[:, 1].min(), boxes[:, 2].max(), boxes[:, 3].max()],
        dtype=np.float64,
    )


def centers(boxes: np.ndarray) -> np.ndarray:
    """[N, 2] array of (cx, cy)."""
    return np.stack(
        [(boxes[:, 0] + boxes[:, 2]) * 0.5, (boxes[:, 1] + boxes[:, 3]) * 0.5], axis=1
    )


def rescale(boxes: np.ndarray, sx: float, sy: float) -> np.ndarray:
    """Scale absolute boxes by per-axis factors (``box.py:775-812``)."""
    return snap_abs(boxes * np.array([sx, sy, sx, sy]))


def intersection_box(box1: np.ndarray, box2: np.ndarray) -> np.ndarray | None:
    """Intersection box of two boxes or None if disjoint (``box.py:617-651``)."""
    lo = np.maximum(box1[:2], box2[:2])
    hi = np.minimum(box1[2:], box2[2:])
    if (hi <= lo).any():
        return None
    return np.concatenate([lo, hi])


def box_to_point4(boxes: np.ndarray) -> np.ndarray:
    """nx4 xyxy → (nx4)x2 corner points (``transform.py:55-65``), corner
    order (ul, lr, ll, ur) exactly as the reference emits."""
    return boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape((-1, 2))


def point4_to_box(points: np.ndarray) -> np.ndarray:
    """(nx4)x2 corner points → nx4 xyxy envelope (``transform.py:68-79``)."""
    pts = points.reshape((-1, 4, 2))
    return np.concatenate((pts.min(axis=1), pts.max(axis=1)), axis=1)
