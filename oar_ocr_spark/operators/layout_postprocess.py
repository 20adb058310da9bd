"""Layout detection postprocess: per-class thresholds, NMS, merge
modes, unclip, overlap removal.

Parity targets (reference = GreatV/oar-ocr at /root/reference):
- Defaults + PP-StructureV3 per-class thresholds (paragraph_title .3,
  formula .3, text .4, seal .45, else .5; nms iou .5; max 100):
  oar-ocr-core/src/domain/tasks/layout_detection.rs:47-129.
- Greedy per-class NMS (score-desc, suppress same-class IoU > thr,
  stop at max_detections): processors/layout_postprocess.rs:482-568.
- NMS-with-merge (Large/Small/Union merge modes, keep earliest
  original index ordering of the top-N): layout_postprocess.rs:692-843.
- unclip_boxes (center-fixed width/height scaling):
  layout_postprocess.rs:623-690.
- Overlapping-element removal (IoA-of-smaller > 0.5; drop the image
  side of an image/non-image pair, else the smaller area):
  processors/layout_utils.rs:802-846 + domain/structure.rs:2305-2339.

All pure numpy/python over per-image candidate lists (N ≤ ~10²) —
vectorization stays at the Arrow-batch level in the layout UDF.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "PP_STRUCTURE_CLASS_THRESHOLDS",
    "filter_by_class_thresholds",
    "nms_keep_indices",
    "apply_nms_with_merge",
    "unclip_boxes",
    "overlap_removal_indices",
]

PP_STRUCTURE_CLASS_THRESHOLDS = {
    "paragraph_title": 0.3,
    "formula": 0.3,
    "text": 0.4,
    "seal": 0.45,
}
DEFAULT_SCORE_THRESHOLD = 0.5
DEFAULT_NMS_THRESHOLD = 0.5
DEFAULT_MAX_ELEMENTS = 100


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    if x2 <= x1 or y2 <= y1:
        return 0.0
    inter = (x2 - x1) * (y2 - y1)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return float(inter / ua) if ua > 0 else 0.0


def filter_by_class_thresholds(
    labels: list[str],
    scores: np.ndarray,
    class_thresholds: dict[str, float] | None = None,
    default_threshold: float = DEFAULT_SCORE_THRESHOLD,
) -> np.ndarray:
    """Keep-mask for per-class score thresholds (layout_detection.rs:47-129)."""
    thr = class_thresholds if class_thresholds is not None else PP_STRUCTURE_CLASS_THRESHOLDS
    cutoffs = np.asarray([thr.get(lb, default_threshold) for lb in labels], dtype=np.float32)
    return np.asarray(scores, dtype=np.float32) >= cutoffs


def nms_keep_indices(
    boxes: np.ndarray,
    classes: np.ndarray,
    scores: np.ndarray,
    nms_threshold: float = DEFAULT_NMS_THRESHOLD,
    max_detections: int = DEFAULT_MAX_ELEMENTS,
) -> list[int]:
    """Greedy per-class NMS keep list (layout_postprocess.rs:482-546).

    Score-descending (stable on ties), suppresses later same-class boxes
    with IoU > threshold, stops once max_detections are kept.
    """
    n = len(boxes)
    if n == 0:
        return []
    order = sorted(range(n), key=lambda i: -float(scores[i]))
    suppressed = [False] * n
    keep: list[int] = []
    for pos, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= max_detections:
            break
        for j in order[pos + 1 :]:
            if suppressed[j] or classes[j] != classes[i]:
                continue
            if _iou(boxes[i], boxes[j]) > nms_threshold:
                suppressed[j] = True
    return keep


def apply_nms_with_merge(
    boxes: np.ndarray,
    classes: np.ndarray,
    scores: np.ndarray,
    class_labels: dict[int, str],
    class_merge_modes: dict[str, str] | None = None,
    nms_threshold: float = DEFAULT_NMS_THRESHOLD,
    max_detections: int = DEFAULT_MAX_ELEMENTS,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """NMS that merges same-class overlaps instead of dropping them
    (layout_postprocess.rs:743-843).

    merge modes: "large" (keep larger box — default), "small", "union".
    Results are limited to the top max_detections by score, then
    reordered by each merged group's earliest original index.
    """
    n = len(boxes)
    if n == 0:
        return (
            np.empty((0, 4), dtype=np.float32),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.float32),
        )
    modes = class_merge_modes or {}
    order = sorted(range(n), key=lambda i: -float(scores[i]))
    processed = [False] * n
    results: list[tuple[int, np.ndarray, int, float]] = []
    for i in order:
        if processed[i]:
            continue
        processed[i] = True
        label = class_labels.get(int(classes[i]), "unknown")
        mode = modes.get(label, "large")
        merged = np.asarray(boxes[i], dtype=np.float32).copy()
        best_score = float(scores[i])
        order_idx = i
        for j in order:
            if i != j and not processed[j] and classes[i] == classes[j]:
                if _iou(merged, boxes[j]) > nms_threshold:
                    merged = _merge_boxes(merged, boxes[j], mode)
                    best_score = max(best_score, float(scores[j]))
                    order_idx = min(order_idx, j)
                    processed[j] = True
        results.append((order_idx, merged, int(classes[i]), best_score))
    results = results[:max_detections]
    results.sort(key=lambda t: t[0])
    out_boxes = np.stack([r[1] for r in results])
    out_classes = np.asarray([r[2] for r in results], dtype=np.int64)
    out_scores = np.asarray([r[3] for r in results], dtype=np.float32)
    return out_boxes, out_classes, out_scores


def _merge_boxes(a: np.ndarray, b: np.ndarray, mode: str) -> np.ndarray:
    """layout_postprocess.rs:692-730."""
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    if mode == "large":
        return (a if area_a >= area_b else np.asarray(b, dtype=np.float32)).copy()
    if mode == "small":
        return (a if area_a <= area_b else np.asarray(b, dtype=np.float32)).copy()
    return np.asarray(
        [min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3])],
        dtype=np.float32,
    )


def unclip_boxes(
    boxes: np.ndarray,
    width_ratio: float = 1.0,
    height_ratio: float = 1.0,
) -> np.ndarray:
    """Center-fixed box scaling (layout_postprocess.rs:623-690)."""
    b = np.asarray(boxes, dtype=np.float32).reshape(-1, 4)
    cx = (b[:, 0] + b[:, 2]) / 2
    cy = (b[:, 1] + b[:, 3]) / 2
    hw = (b[:, 2] - b[:, 0]) / 2 * np.float32(width_ratio)
    hh = (b[:, 3] - b[:, 1]) / 2 * np.float32(height_ratio)
    return np.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=1)


def overlap_removal_indices(
    boxes: np.ndarray, labels: list[str], threshold: float = 0.5
) -> set[int]:
    """Indices of elements to drop because a pair overlaps with
    IoA-of-the-smaller > threshold (layout_utils.rs:802-846): the image
    of an image/non-image pair is dropped, else the smaller box."""
    n = len(boxes)
    dropped: set[int] = set()
    b = np.asarray(boxes, dtype=np.float32).reshape(-1, 4)
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    for i in range(n):
        if i in dropped:
            continue
        for j in range(i + 1, n):
            if j in dropped:
                continue
            x1, y1 = max(b[i, 0], b[j, 0]), max(b[i, 1], b[j, 1])
            x2, y2 = min(b[i, 2], b[j, 2]), min(b[i, 3], b[j, 3])
            inter = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
            smaller = min(areas[i], areas[j])
            ratio = float(inter / smaller) if smaller > 0 else 0.0
            if ratio > threshold:
                ii, jj = labels[i] == "image", labels[j] == "image"
                if ii != jj:
                    dropped.add(i if ii else j)
                else:
                    dropped.add(i if areas[i] < areas[j] else j)
    return dropped
