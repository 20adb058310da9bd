"""Geometry tests: IoU/IoA formulas (sorting.rs:525-565) and
rotate_back_to_original point maps (geometry.rs:848-886, unit tests at
geometry.rs:1270-1320)."""

import numpy as np

from oar_ocr_spark.operators.geometry import (
    box_area,
    iou,
    overlap_ratio,
    rotate_back_to_original,
    translate_boxes,
)


def test_iou_basic():
    a = np.array([[0, 0, 10, 10]], dtype=np.float32)
    b = np.array([[5, 5, 15, 15]], dtype=np.float32)
    # inter 25, union 175
    np.testing.assert_allclose(iou(a, b)[0, 0], 25 / 175, rtol=1e-6)


def test_iou_disjoint_and_identical():
    a = np.array([[0, 0, 10, 10]], dtype=np.float32)
    b = np.array([[20, 20, 30, 30]], dtype=np.float32)
    assert iou(a, b)[0, 0] == 0.0
    assert iou(a, a)[0, 0] == 1.0


def test_overlap_ratio_is_ioa():
    a = np.array([[0, 0, 10, 10]], dtype=np.float32)  # area 100
    b = np.array([[0, 0, 5, 10]], dtype=np.float32)  # covers half of a
    np.testing.assert_allclose(overlap_ratio(a, b)[0, 0], 0.5, rtol=1e-6)
    np.testing.assert_allclose(overlap_ratio(b, a)[0, 0], 1.0, rtol=1e-6)


def test_rotate_back_90():
    # corrected image is W=?; detected angle 90 → (x,y)->(rh - y, x).
    # Source 200x100 rotated 90° CCW to correct → corrected 100x200 (w,h).
    boxes = np.array([[10, 20, 30, 40]], dtype=np.float32)
    out = rotate_back_to_original(boxes, 90, rotated_width=100, rotated_height=200)
    # corners (10,20),(30,40) → (200-20,10)=(180,10),(200-40,30)=(160,30)
    # normalized AABB: x:[160,180] y:[10,30]
    np.testing.assert_allclose(out[0], [160, 10, 180, 30], atol=1e-5)


def test_rotate_back_180():
    boxes = np.array([[10, 20, 30, 40]], dtype=np.float32)
    out = rotate_back_to_original(boxes, 180, rotated_width=100, rotated_height=200)
    np.testing.assert_allclose(out[0], [70, 160, 90, 180], atol=1e-5)


def test_rotate_back_270():
    boxes = np.array([[10, 20, 30, 40]], dtype=np.float32)
    out = rotate_back_to_original(boxes, 270, rotated_width=100, rotated_height=200)
    # (x,y)->(y, rw - x): (10,20)->(20,90), (30,40)->(40,70) → x:[20,40] y:[70,90]
    np.testing.assert_allclose(out[0], [20, 70, 40, 90], atol=1e-5)


def test_rotate_back_roundtrip_via_forward_map():
    # forward: rotating source (W0,H0) by angle a maps source pixel to
    # corrected; rotate_back must invert it for all three angles.
    rng = np.random.default_rng(7)
    for angle in (90, 180, 270):
        W0, H0 = 240, 180
        if angle in (90, 270):
            rw, rh = H0, W0
        else:
            rw, rh = W0, H0
        pts = rng.uniform(0, min(W0, H0) / 2, size=(5, 4)).astype(np.float32)
        boxes = np.stack(
            [pts[:, 0], pts[:, 1], pts[:, 0] + pts[:, 2] + 1, pts[:, 1] + pts[:, 3] + 1], axis=1
        )
        # forward map source → corrected coords
        x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
        if angle == 90:  # correcting rotates image 90° CCW: (x,y)->(y, W0-x)
            fx1, fy1, fx2, fy2 = y1, W0 - x2, y2, W0 - x1
        elif angle == 180:
            fx1, fy1, fx2, fy2 = W0 - x2, H0 - y2, W0 - x1, H0 - y1
        else:  # 270: correcting rotates 90° CW: (x,y)->(H0-y, x)
            fx1, fy1, fx2, fy2 = H0 - y2, x1, H0 - y1, x2
        corrected = np.stack([fx1, fy1, fx2, fy2], axis=1)
        back = rotate_back_to_original(corrected, angle, rw, rh)
        np.testing.assert_allclose(back, boxes, atol=1e-3)


def test_translate_and_area():
    b = np.array([[1, 2, 4, 6]], dtype=np.float32)
    np.testing.assert_allclose(box_area(b), [12.0])
    t = translate_boxes(b, 10, -1)
    np.testing.assert_allclose(t[0], [11, 1, 14, 5])
