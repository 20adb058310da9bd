"""Resize operator tests — geometric contracts from
resize_detection.rs:243-320 and resize_recognition.rs:84-130."""

import numpy as np

from oar_ocr_spark.models.synthetic import BG
from oar_ocr_spark.operators.resize import (
    detection_target_dims,
    nn_resize,
    resize_for_detection,
    resize_for_recognition,
)


def test_detection_dims_max_type_no_shrink_below_limit():
    # max side 500 < 960 → ratio 1, snap to multiples of 32
    assert detection_target_dims(500, 300, 960, "max") == (512, 288)


def test_detection_dims_max_type_shrinks():
    # 2000 > 960 → ratio 0.48 → (960, 480) → snap
    h, w = detection_target_dims(2000, 1000, 960, "max")
    assert h == 960 and w == 480
    assert h % 32 == 0 and w % 32 == 0


def test_detection_dims_min_type_grows():
    h, w = detection_target_dims(100, 400, 736, "min")
    # min side 100 < 736 → ratio 7.36 → (736, 2944)
    assert h == 736 and w == 2944


def test_detection_dims_max_side_limit():
    h, w = detection_target_dims(100, 400, 736, "min", max_side_limit=2000)
    assert max(h, w) <= 2016  # snapped to multiple of 32 after clamp
    assert h % 32 == 0 and w % 32 == 0


def test_detection_dims_floor_32():
    assert detection_target_dims(8, 8, 960, "max") == (32, 32)


def test_detection_rounding_16_rule():
    # (v + 16) // 32 * 32: 47 → 32, 48 → 64
    assert detection_target_dims(47, 47, 960, "max") == (32, 32)
    assert detection_target_dims(48, 48, 960, "max") == (64, 64)


def test_nn_resize_preserves_values():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    out = nn_resize(img, 6, 8)
    assert set(np.unique(out)) <= set(np.unique(img))
    assert out.shape == (6, 8)
    assert nn_resize(img, 3, 4) is img  # no-op passthrough


def test_resize_for_detection_ratios():
    img = np.zeros((100, 200), dtype=np.uint8)
    out, rh, rw = resize_for_detection(img)
    assert out.shape == (96, 192)
    assert abs(rh - 0.96) < 1e-9 and abs(rw - 0.96) < 1e-9


def test_recognition_resize_pad_right():
    crop = np.zeros((20, 40), dtype=np.uint8)  # ratio 2.0
    out = resize_for_recognition(crop, target_h=48, max_wh_ratio=4.0)
    assert out.shape == (48, 192)
    # content occupies left ceil(48*2)=96 cols; the rest is background pad
    assert (out[:, 96:] == BG).all() or (out[:, 96:] == 255).all()
    assert (out[:, :96] == 0).all()


def test_recognition_resize_caps_width():
    crop = np.zeros((10, 10000), dtype=np.uint8)
    out = resize_for_recognition(crop, target_h=48, max_wh_ratio=1000.0, max_img_w=3200)
    assert out.shape == (48, 3200)
