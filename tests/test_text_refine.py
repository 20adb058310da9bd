"""Tests for cross-layout splitting (structure.rs:2230-2322),
tiny-symbol/checkbox normalization (stitching.rs:831-905), and
title-level inference (domain/structure.rs:18-297)."""

import numpy as np

from oar_ocr_spark.operators.text_refine import (
    infer_levels_by_kmeans_feature,
    infer_paragraph_title_levels,
    normalize_checkbox_symbols,
    normalize_tiny_symbol,
    semantic_title_level,
    split_cross_layout_boxes,
)


def test_split_box_spanning_two_columns():
    det = np.array([[10, 10, 200, 30]], dtype=np.float32)
    containers = np.array([[0, 0, 95, 300], [105, 0, 210, 300]], dtype=np.float32)
    out = split_cross_layout_boxes(det, containers)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(out[0], [10, 10, 95, 30])
    np.testing.assert_allclose(out[1], [105, 10, 200, 30])


def test_split_requires_two_intersections_and_ioa():
    det = np.array([[10, 10, 90, 30]], dtype=np.float32)  # inside one container
    containers = np.array([[0, 0, 95, 300], [105, 0, 210, 300]], dtype=np.float32)
    out = split_cross_layout_boxes(det, containers)
    np.testing.assert_allclose(out, det)
    # tiny sliver (< 0.3 IoA in second container) is not split
    det2 = np.array([[10, 10, 110, 30]], dtype=np.float32)
    out2 = split_cross_layout_boxes(det2, containers)
    np.testing.assert_allclose(out2, det2)


def test_split_preserves_pass_through_order():
    det = np.array([[10, 10, 200, 30], [10, 50, 80, 70]], dtype=np.float32)
    containers = np.array([[0, 0, 95, 300], [105, 0, 210, 300]], dtype=np.float32)
    out = split_cross_layout_boxes(det, containers)
    assert out.shape == (3, 4)
    np.testing.assert_allclose(out[2], det[1])


def test_normalize_tiny_symbol():
    assert normalize_tiny_symbol("=", 0.4, 8.0, 7.0) == ","
    assert normalize_tiny_symbol("=", 0.4, 12.0, 9.0) == "-"
    assert normalize_tiny_symbol("0", 0.1, 10.0, 10.0) == ";"
    assert normalize_tiny_symbol("=", 0.5, 8.0, 7.0) is None  # conf too high
    assert normalize_tiny_symbol("ab", 0.1, 8.0, 7.0) is None  # not single char
    assert normalize_tiny_symbol(None, 0.1, 8.0, 7.0) is None


def test_checkbox_normalization_safe_vs_ambiguous():
    # safe glyphs normalize regardless
    out = normalize_checkbox_symbols(["√", "✖", "hello", None])
    assert out == ["✓", "✗", "hello", None]
    # ambiguous X only normalizes when the table is checkbox-like
    assert normalize_checkbox_symbols(["X", "text"]) == ["X", "text"]
    out2 = normalize_checkbox_symbols(["X", "√"])  # pos + neg candidates
    assert out2 == ["✗", "✓"]
    # ambiguous L likewise
    assert normalize_checkbox_symbols(["L", "x"]) == ["✓", "✗"]


def test_semantic_title_level():
    assert semantic_title_level("Abstract") == 2
    assert semantic_title_level("REFERENCES:") == 2
    assert semantic_title_level("1 Introduction") == 2
    assert semantic_title_level("1.2 Methods") == 3
    assert semantic_title_level("1.2.3 Details") == 4
    assert semantic_title_level("（一） 概述") == 2
    # "IV." keeps its trailing dot in the numbering capture, so the
    # reference's dot-count gives level 3 (structure.rs:74-90)
    assert semantic_title_level("IV. Results") == 3
    assert semantic_title_level("IV Results") == 2
    assert semantic_title_level("No numbering here") is None


def test_kmeans_levels_descending_font_size():
    # two height clusters (values within 1e-3 count as one unique →
    # k=2, structure.rs:226-233): big titles → level 2, small → 3
    samples = [(0, 30.0), (1, 30.0), (2, 12.0), (3, 12.0)]
    levels = infer_levels_by_kmeans_feature(samples, descending=True)
    assert levels[0] == levels[1] == 2
    assert levels[2] == levels[3] == 3


def test_kmeans_levels_distinct_values_one_cluster_each():
    # four distinct values → k=4 singleton clusters (reference
    # behavior: unique_count clamped to 4)
    samples = [(0, 30.5), (1, 30.0), (2, 12.2), (3, 12.0)]
    levels = infer_levels_by_kmeans_feature(samples, descending=True)
    assert levels == {0: 2, 1: 3, 2: 4, 3: 5}


def test_infer_paragraph_title_levels_votes():
    def t(idx, x1, y1, h, num_lines, text):
        return (idx, np.array([x1, y1, x1 + 100, y1 + h], dtype=np.float32), num_lines, text)

    titles = [
        t(0, 10, 10, 30, 1, "1 Introduction"),
        t(1, 10, 100, 30, 1, "2 Methods"),
        t(2, 30, 200, 14, 1, "2.1 Data"),
        t(3, 30, 300, 14, 1, "2.2 Models"),
    ]
    levels = infer_paragraph_title_levels(titles)
    assert levels[0] == 2 and levels[1] == 2
    assert levels[2] == 3 and levels[3] == 3
