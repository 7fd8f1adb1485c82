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
