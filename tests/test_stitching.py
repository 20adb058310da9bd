"""Stitch text-join tests mirroring /root/reference/src/oarocr/stitching.rs
test module (stitching.rs:2087+) semantics: same-line tolerance,
paragraph-gap thresholds 0.3/0.5, dehyphenation, formula wrapping."""

import numpy as np

from oar_ocr_spark.operators.stitching import (
    StitchConfig,
    is_non_break_line_end_punctuation,
    is_same_text_line,
    last_non_whitespace_char,
    needs_space_after,
    sort_and_join_texts,
)


def test_needs_space_after():
    assert needs_space_after("a") and needs_space_after("Z")
    assert not needs_space_after("中") and not needs_space_after("1") and not needs_space_after(".")


def test_last_non_whitespace_char():
    assert last_non_whitespace_char("ab c  \n") == "c"
    assert last_non_whitespace_char("   ") is None


def test_non_break_punctuation():
    for c in ",，、;；:：":
        assert is_non_break_line_end_punctuation(c)
    assert not is_non_break_line_end_punctuation(".")


def test_same_line_by_height_overlap():
    cfg = StitchConfig()
    a = np.array([0, 10, 50, 30])  # h=20
    b = np.array([60, 12, 100, 32])  # overlap 18 / min(20,20) = 0.9 >= 0.6
    assert is_same_text_line(a, b, cfg)
    c = np.array([60, 40, 100, 60])
    assert not is_same_text_line(a, c, cfg)


def test_join_same_line_english_spacing():
    boxes = np.array([[0, 0, 40, 20], [50, 0, 90, 20]], dtype=np.float32)
    out = sort_and_join_texts(boxes, ["hello", "world"])
    assert out == "hello world"


def test_join_same_line_cjk_no_space():
    boxes = np.array([[0, 0, 40, 20], [50, 0, 90, 20]], dtype=np.float32)
    out = sort_and_join_texts(boxes, ["中文", "文本"])
    assert out == "中文文本"


def test_join_x_order_within_line():
    boxes = np.array([[50, 0, 90, 20], [0, 2, 40, 22]], dtype=np.float32)
    out = sort_and_join_texts(boxes, ["world", "hello"])
    assert out == "hello world"


def test_paragraph_break_on_large_right_gap():
    # container width 200; first line ends at x=60 → right gap 140 > 0.3*200
    container = np.array([0, 0, 200, 100], dtype=np.float32)
    boxes = np.array([[0, 0, 60, 20], [0, 40, 180, 60]], dtype=np.float32)
    out = sort_and_join_texts(boxes, ["末尾。", "新段落"], container_bbox=container)
    assert out == "末尾。\n新段落"


def test_english_tail_uses_05_ratio_soft_wrap():
    # tail is an English letter → ratio 0.5: right gap 80 < 100 → wrap + space
    container = np.array([0, 0, 200, 100], dtype=np.float32)
    boxes = np.array([[0, 0, 120, 20], [0, 40, 180, 60]], dtype=np.float32)
    out = sort_and_join_texts(boxes, ["wrapped line", "continues"], container_bbox=container)
    assert out == "wrapped line continues"


def test_dehyphenation_at_wrap():
    container = np.array([0, 0, 200, 100], dtype=np.float32)
    # first line extends to near right edge (gap 10 < thresholds) and ends with '-'
    boxes = np.array([[0, 0, 190, 20], [0, 40, 100, 60]], dtype=np.float32)
    out = sort_and_join_texts(boxes, ["real-", "time"], container_bbox=container)
    assert out == "realtime"


def test_hyphen_kept_on_paragraph_break():
    container = np.array([0, 0, 200, 100], dtype=np.float32)
    # short CJK-tailed line ending with '-': right gap 140 > 0.3*200 → newline keeps '-'
    boxes = np.array([[0, 0, 60, 20], [0, 40, 100, 60]], dtype=np.float32)
    out = sort_and_join_texts(boxes, ["端-", "下一段"], container_bbox=container)
    assert out == "端-\n下一段"


def test_non_break_punct_suppresses_paragraph_break():
    container = np.array([0, 0, 200, 100], dtype=np.float32)
    boxes = np.array([[0, 0, 60, 20], [0, 40, 180, 60]], dtype=np.float32)
    out = sort_and_join_texts(boxes, ["列表：", "第一项"], container_bbox=container)
    assert out == "列表：第一项"


def test_formula_wrapping_inline_and_display():
    boxes = np.array([[0, 0, 60, 20], [70, 0, 120, 20]], dtype=np.float32)
    out = sort_and_join_texts(
        boxes, ["x^2", "next"], is_formula=[True, False]
    )
    # display (line start) → $$…$$, then space after formula on same line
    assert out == "$$x^2$$ next"
    out2 = sort_and_join_texts(boxes, ["see", "y=mx"], is_formula=[False, True])
    assert out2 == "see $y=mx$"


def test_empty_texts_skipped():
    boxes = np.array([[0, 0, 40, 20], [50, 0, 90, 20]], dtype=np.float32)
    assert sort_and_join_texts(boxes, ["", "solo"]) == "solo"
    assert sort_and_join_texts(np.empty((0, 4)), []) == ""
