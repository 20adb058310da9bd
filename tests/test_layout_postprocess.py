"""Layout postprocess tests: per-class thresholds
(layout_detection.rs:47-129), greedy NMS (layout_postprocess.rs:482-546),
merge NMS (:743-843), unclip (:623-690), overlap removal
(layout_utils.rs:802-846)."""

import numpy as np

from oar_ocr_spark.operators.layout_postprocess import (
    apply_nms_with_merge,
    filter_by_class_thresholds,
    nms_keep_indices,
    overlap_removal_indices,
    unclip_boxes,
)


def test_class_thresholds_pp_structure():
    labels = ["paragraph_title", "text", "seal", "table", "formula"]
    scores = np.array([0.35, 0.35, 0.5, 0.45, 0.31])
    keep = filter_by_class_thresholds(labels, scores)
    # thresholds: .3, .4, .45, .5(default), .3
    assert list(keep) == [True, False, True, False, True]


def test_nms_suppresses_same_class_only():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10]], dtype=np.float32
    )
    classes = np.array([0, 0, 1])
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms_keep_indices(boxes, classes, scores, nms_threshold=0.5)
    assert keep == [0, 2]  # box1 suppressed by box0; class-1 box survives


def test_nms_max_detections():
    boxes = np.array([[i * 20, 0, i * 20 + 10, 10] for i in range(5)], dtype=np.float32)
    classes = np.zeros(5, dtype=int)
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5])
    keep = nms_keep_indices(boxes, classes, scores, max_detections=3)
    assert keep == [0, 1, 2]


def test_merge_nms_union_mode():
    boxes = np.array([[0, 0, 10, 10], [5, 0, 15, 10]], dtype=np.float32)
    classes = np.array([0, 0])
    scores = np.array([0.9, 0.8])
    out_boxes, out_classes, out_scores = apply_nms_with_merge(
        boxes, classes, scores, {0: "table"}, {"table": "union"}, nms_threshold=0.3
    )
    assert len(out_boxes) == 1
    np.testing.assert_allclose(out_boxes[0], [0, 0, 15, 10])
    assert out_scores[0] == np.float32(0.9)


def test_merge_nms_large_mode_and_order_restoration():
    # three boxes: 1 overlaps 0 (same class); higher score at index 1;
    # the merged group's earliest original index (0) drives final order
    boxes = np.array(
        [[0, 0, 10, 10], [0, 0, 12, 12], [50, 50, 60, 60]], dtype=np.float32
    )
    classes = np.array([0, 0, 0])
    scores = np.array([0.7, 0.9, 0.8])
    out_boxes, _, out_scores = apply_nms_with_merge(
        boxes, classes, scores, {0: "text"}, None, nms_threshold=0.3
    )
    assert len(out_boxes) == 2
    # group (0,1) keeps the larger box (index 1's) and best score 0.9,
    # ordered before the disjoint box at original index 2
    np.testing.assert_allclose(out_boxes[0], [0, 0, 12, 12])
    assert out_scores[0] == np.float32(0.9)
    np.testing.assert_allclose(out_boxes[1], [50, 50, 60, 60])


def test_unclip_boxes_center_fixed():
    boxes = np.array([[10, 10, 30, 20]], dtype=np.float32)
    out = unclip_boxes(boxes, width_ratio=1.5, height_ratio=2.0)
    np.testing.assert_allclose(out[0], [5, 5, 35, 25])


def test_overlap_removal_image_vs_text():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 9, 9]], dtype=np.float32)
    # image overlapping text → drop the image regardless of area
    assert overlap_removal_indices(boxes, ["image", "text"], 0.5) == {0}
    assert overlap_removal_indices(boxes, ["text", "image"], 0.5) == {1}
    # same kind → drop the smaller
    assert overlap_removal_indices(boxes, ["text", "text"], 0.5) == {1}
    # disjoint → nothing dropped
    far = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=np.float32)
    assert overlap_removal_indices(far, ["text", "text"], 0.5) == set()
