"""Coordinate/image transform kernels.

Parity with ``dd_core/src/dd_core/utils/transform.py`` (``ResizeTransform``
:145, ``PadTransform`` :337, ``RotationTransform`` :431) and the box
re-framing helpers in ``datapoint/box.py`` (``local_to_global_coords`` :687,
``global_to_local_coords`` :718, ``crop_box_from_image``-style clipping :654).

These operate on ``[N, 4]`` xyxy arrays so a whole turn's geometry transforms
in one vectorized call — the ``SimpleTransformService`` analog
(``pipe/transform.py:33-113``) is a stateless ``map_batches`` applying them
before the ordering kernels.
"""

from __future__ import annotations

import numpy as np

from . import boxes as B


def resize_boxes(
    boxes: np.ndarray, old_w: float, old_h: float, new_w: float, new_h: float
) -> np.ndarray:
    """``ResizeTransform.apply_coords`` (``transform.py:145-200``)."""
    return B.rescale(boxes, new_w / old_w, new_h / old_h)


def pad_boxes(boxes: np.ndarray, left: float, top: float) -> np.ndarray:
    """``PadTransform.apply_coords`` (``transform.py:337-400``): padding a page
    shifts every box by the top-left pad."""
    return B.snap_abs(boxes + np.array([left, top, left, top]))


def unpad_boxes(
    boxes: np.ndarray, left: float, top: float, width: float, height: float
) -> np.ndarray:
    """``PadTransform.inverse_apply_coords``: shift back and clip into the
    original page frame."""
    out = boxes - np.array([left, top, left, top])
    out[:, 0] = np.clip(out[:, 0], 0.0, width)
    out[:, 1] = np.clip(out[:, 1], 0.0, height)
    out[:, 2] = np.clip(out[:, 2], 0.0, width)
    out[:, 3] = np.clip(out[:, 3], 0.0, height)
    return B.snap_abs(out)


def rotate_boxes(boxes: np.ndarray, angle: int, width: float, height: float) -> np.ndarray:
    """``RotationTransform.apply_coords`` (``transform.py:431-500``) for right
    angles (90/180/270, counter-clockwise page rotation).

    Returns boxes in the rotated frame; the rotated page has swapped extents
    for 90/270.
    """
    if angle % 360 == 0:
        return boxes.copy()
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    if angle % 360 == 90:  # (x, y) → (y, W - x)
        out = np.stack([y0, width - x1, y1, width - x0], axis=1)
    elif angle % 360 == 180:
        out = np.stack([width - x1, height - y1, width - x0, height - y0], axis=1)
    elif angle % 360 == 270:  # (x, y) → (H - y, x)
        out = np.stack([height - y1, x0, height - y0, x1], axis=1)
    else:
        raise ValueError(f"only right angles supported, got {angle}")
    return B.snap_abs(out)


def rotated_extent(angle: int, width: float, height: float) -> tuple[float, float]:
    """Page extent after a right-angle rotation."""
    return (height, width) if angle % 180 == 90 else (width, height)


def local_to_global(boxes: np.ndarray, frame_box: np.ndarray) -> np.ndarray:
    """``box.py:687-716``: boxes expressed inside a crop frame → page coords."""
    shift = np.array([frame_box[0], frame_box[1], frame_box[0], frame_box[1]])
    return B.snap_abs(boxes + shift)


def global_to_local(boxes: np.ndarray, frame_box: np.ndarray) -> np.ndarray:
    """``box.py:718-755``: page coords → crop-frame coords, clipped into the
    frame."""
    fw = frame_box[2] - frame_box[0]
    fh = frame_box[3] - frame_box[1]
    out = boxes - np.array([frame_box[0], frame_box[1], frame_box[0], frame_box[1]])
    out[:, 0] = np.clip(out[:, 0], 0.0, fw)
    out[:, 1] = np.clip(out[:, 1], 0.0, fh)
    out[:, 2] = np.clip(out[:, 2], 0.0, fw)
    out[:, 3] = np.clip(out[:, 3], 0.0, fh)
    return B.snap_abs(out)


def crop_boxes(boxes: np.ndarray, frame_box: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Select boxes intersecting a crop frame and re-frame them locally
    (``image.py:817-897`` ``image_ann_to_image`` semantics).

    Returns ``(kept_indices, local_boxes)``.
    """
    inter = B.intersection_matrix(boxes, frame_box[None, :])[:, 0]
    keep = np.nonzero(inter > 0)[0]
    return keep, global_to_local(boxes[keep], frame_box)


def estimate_skew_angle(
    boxes: np.ndarray,
    limit_deg: float = 10.0,
    coarse_step: float = 0.5,
    fine_step: float = 0.05,
) -> float:
    """Projection-profile skew estimation over word-box centers (weight-free).

    The reference estimates the deskew angle from the page image
    (``extern/deskew.py:37``, ``extern/tessocr.py:434`` OSD); with no image
    libs in this environment the same projection-profile idea runs on the
    text GEOMETRY: for each candidate angle the box centers are rotated and
    binned into horizontal lines; the angle whose profile has maximum energy
    (sum of squared bin counts — sharpest line peaks) is the skew. Coarse
    scan ± ``limit_deg`` then a fine pass around the winner.

    Two passes: (1) coarse histogram scan finds the approximate angle (the
    binned profile has a plateau of tied maxima ~±0.5° wide — its midpoint is
    only approximately right); (2) the centers are de-rotated by the coarse
    answer, clustered into lines by the y-gap, and each line's residual slope
    is recovered by least squares — a CONTINUOUS estimate with no bin
    quantization, exact on clean pages.

    Returns the angle that flattens the text lines (≈ the negative of the
    rotation that skewed the page); ``fine_step`` is kept for API
    compatibility (the fine pass is analytic).
    """
    del fine_step  # the regression pass replaced the fine grid
    if boxes.shape[0] < 3:
        return 0.0
    cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
    cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
    med_h = max(float(np.median(boxes[:, 3] - boxes[:, 1])), 2.0)
    bin_h = med_h / 2.0

    def energy(angle_deg: float) -> float:
        a = np.deg2rad(angle_deg)
        y = cy * np.cos(a) - cx * np.sin(a)
        bins = np.floor((y - y.min()) / bin_h).astype(np.int64)
        counts = np.bincount(bins)
        return float((counts.astype(np.float64) ** 2).sum())

    coarse = np.arange(-limit_deg, limit_deg + coarse_step / 2, coarse_step)
    scores = np.array([energy(a) for a in coarse])
    near = np.where(scores >= scores.max() - 1e-9)[0]
    a0 = float(coarse[near[len(near) // 2]])

    # de-rotate by the coarse angle, cluster lines on the y axis, regress the
    # residual slope per line on the ORIGINAL centers
    r = np.deg2rad(a0)
    y0 = cy * np.cos(r) - cx * np.sin(r)
    order = np.argsort(y0, kind="stable")
    slopes: list[float] = []
    weights: list[int] = []
    start = 0
    ys = y0[order]
    for k in range(1, len(order) + 1):
        if k == len(order) or ys[k] - ys[k - 1] > med_h:
            members = order[start:k]
            if members.size >= 3 and np.ptp(cx[members]) > 1e-9:
                m = np.polyfit(cx[members], cy[members], 1)[0]
                slopes.append(float(m))
                weights.append(int(members.size))
            start = k
    if not slopes:
        return round(a0, 2)
    mean_slope = float(np.average(slopes, weights=weights))
    return round(float(np.degrees(np.arctan(mean_slope))), 2)


def rotate_boxes_by_degrees(
    boxes: np.ndarray, angle_deg: float, width: float, height: float
) -> np.ndarray:
    """Rotate boxes by an arbitrary angle about the page center (axis-aligned
    envelope of the rotated corners) — the geometry half of applying an
    estimated deskew."""
    a = np.deg2rad(angle_deg)
    cosa, sina = np.cos(a), np.sin(a)
    ccx, ccy = width / 2.0, height / 2.0
    corners = np.stack(
        [
            boxes[:, [0, 1]], boxes[:, [2, 1]], boxes[:, [0, 3]], boxes[:, [2, 3]],
        ],
        axis=1,
    )  # [N, 4, 2]
    x = corners[:, :, 0] - ccx
    y = corners[:, :, 1] - ccy
    xr = x * cosa + y * sina + ccx
    yr = -x * sina + y * cosa + ccy
    return np.stack([xr.min(1), yr.min(1), xr.max(1), yr.max(1)], axis=1)
