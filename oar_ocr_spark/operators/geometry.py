"""Axis-aligned box geometry (vectorized numpy).

Parity targets (reference = GreatV/oar-ocr at /root/reference):
- iou / overlap_ratio:  oar-ocr-core/src/processors/sorting.rs:525-565
  (also geometry.rs:659,734 — same formulas)
- rotate_back_to_original: oar-ocr-core/src/processors/geometry.rs:848-886
- translate: geometry.rs:109 (box + crop offset arithmetic used by the
  seal/cross-layout paths, src/oarocr/structure.rs:2009-2075)

Boxes are float32 arrays of shape (N, 4) = [x_min, y_min, x_max, y_max].
The reference keeps quads/polys; this engine's synthetic pages are
axis-aligned so the AABB form is exact, and every formula below matches
the reference's accessor-based math on AABBs bit-for-bit in float32.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "box_area",
    "intersection_area",
    "iou",
    "overlap_ratio",
    "rotate_back_to_original",
    "translate_boxes",
]


def box_area(boxes: np.ndarray) -> np.ndarray:
    """Area of each AABB. boxes: (N,4) -> (N,)."""
    b = np.asarray(boxes, dtype=np.float32).reshape(-1, 4)
    return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])


def intersection_area(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise intersection areas. a: (N,4), b: (M,4) -> (N,M)."""
    a = np.asarray(a, dtype=np.float32).reshape(-1, 4)
    b = np.asarray(b, dtype=np.float32).reshape(-1, 4)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    w = np.maximum(x2 - x1, 0.0)
    h = np.maximum(y2 - y1, 0.0)
    return w * h


def iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU (sorting.rs:525-544). (N,4),(M,4) -> (N,M)."""
    inter = intersection_area(a, b)
    area_a = box_area(a)[:, None]
    area_b = box_area(b)[None, :]
    union = area_a + area_b - inter
    out = np.zeros_like(inter)
    np.divide(inter, union, out=out, where=union > 0)
    return out


def overlap_ratio(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoA: intersection / area(a) (sorting.rs:548-565).

    "How much of `a` is covered by `b`" — the reference's
    calculate_overlap_ratio / BoundingBox::ioa.
    """
    inter = intersection_area(a, b)
    area_a = box_area(a)[:, None]
    out = np.zeros_like(inter)
    np.divide(inter, np.broadcast_to(area_a, inter.shape), out=out, where=area_a > 0)
    return out


def rotate_back_to_original(
    boxes: np.ndarray, angle: int, rotated_width: int, rotated_height: int
) -> np.ndarray:
    """Map boxes from the orientation-corrected image back to source coords.

    Exact port of BoundingBox::rotate_back_to_original
    (geometry.rs:848-886). `angle` is the *detected* orientation
    (0/90/180/270); (rotated_width, rotated_height) are the dims of the
    corrected (upright) image the boxes live in.

    Point maps:
      90:  (x, y) -> (rotated_height - y, x)
      180: (x, y) -> (rotated_width - x, rotated_height - y)
      270: (x, y) -> (y, rotated_width - x)
    """
    b = np.asarray(boxes, dtype=np.float32).reshape(-1, 4)
    if b.size == 0 or angle % 360 == 0:
        return b.copy()
    rw = np.float32(rotated_width)
    rh = np.float32(rotated_height)
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    a = int(angle) % 360
    if a == 90:
        nx1, ny1 = rh - y2, x1
        nx2, ny2 = rh - y1, x2
    elif a == 180:
        nx1, ny1 = rw - x2, rh - y2
        nx2, ny2 = rw - x1, rh - y1
    elif a == 270:
        nx1, ny1 = y1, rw - x2
        nx2, ny2 = y2, rw - x1
    else:  # unknown angle: reference applies no transform
        return b.copy()
    return np.stack([nx1, ny1, nx2, ny2], axis=1).astype(np.float32)


def translate_boxes(boxes: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """Shift boxes by (dx, dy) — crop-offset back-translation
    (BoundingBox::translate, geometry.rs:109; used structure.rs:2009-2075)."""
    b = np.asarray(boxes, dtype=np.float32).reshape(-1, 4).copy()
    b[:, [0, 2]] += np.float32(dx)
    b[:, [1, 3]] += np.float32(dy)
    return b
