"""xycut_enhanced tests — vectors ported 1:1 from
/root/reference/oar-ocr-core/src/processors/layout_sorting.rs test module
(lines 946-1034)."""

import numpy as np

from oar_ocr_spark.operators.layout_sorting import (
    SortableBlock,
    _associate_child_blocks,
    sort_layout_enhanced,
)
from oar_ocr_spark.operators.layout_types import (
    SHOULD_OCR,
    from_label,
    order_label,
    SEMANTIC_CATEGORY,
)


def elem(x1, y1, x2, y2, etype, num_lines=2):
    return (np.array([x1, y1, x2, y2], dtype=np.float32), etype, num_lines)


def sort(elements):
    return sort_layout_enhanced(elements, 400.0, 600.0)


def test_empty_input():
    assert sort_layout_enhanced([], 400.0, 600.0) == []


def test_headers_first_footers_last():
    # layout_sorting.rs:969-981
    elements = [
        elem(20, 110, 380, 135, "text"),
        elem(20, 560, 380, 585, "footer"),
        elem(20, 25, 380, 45, "header"),
        elem(20, 5, 380, 20, "header"),
        elem(20, 145, 380, 170, "text"),
    ]
    assert sort(elements) == [3, 2, 0, 4, 1]


def test_doc_title_before_body():
    # layout_sorting.rs:984-993
    elements = [
        elem(20, 90, 380, 120, "text"),
        elem(20, 55, 380, 80, "doc_title"),
        elem(20, 130, 380, 160, "text"),
    ]
    assert sort(elements) == [1, 0, 2]


def test_two_column_text_by_rows():
    # layout_sorting.rs:996-1006: two columns with row gaps → row-major
    elements = [
        elem(215, 120, 380, 150, "text"),
        elem(20, 40, 185, 70, "text"),
        elem(215, 40, 380, 70, "text"),
        elem(20, 120, 185, 150, "text"),
    ]
    assert sort(elements) == [1, 2, 3, 0]


def test_associate_child_blocks_keeps_adjacent_title():
    # layout_sorting.rs:1009-1033
    blocks = [
        SortableBlock(np.array([20, 20, 380, 45], dtype=np.float32), 0, "text", 1),
        SortableBlock(np.array([20, 90, 220, 190], dtype=np.float32), 1, "image", 5),
        SortableBlock(np.array([20, 192, 220, 210], dtype=np.float32), 2, "figure_title", 1),
        SortableBlock(np.array([20, 230, 380, 255], dtype=np.float32), 3, "text", 1),
    ]
    _associate_child_blocks(blocks)
    assert [b.original_index for b in blocks] == [0, 1, 2, 3]


def test_vision_block_inserted_after_xycut():
    # a single-column page with an image between paragraphs: the image
    # is weighted-inserted between its vertical neighbors
    elements = [
        elem(20, 40, 380, 90, "text", 3),
        elem(20, 290, 380, 340, "text", 3),
        elem(20, 110, 380, 270, "image", 1),
    ]
    order = sort(elements)
    assert order == [0, 2, 1]


def test_label_maps():
    assert from_label("Title") == "paragraph_title"
    assert from_label("figure") == "image"
    assert from_label("vertical_text") == "text"
    assert from_label("whatever") == "other"
    assert order_label("table") == "vision"
    assert order_label("figure_title") == "vision_title"
    assert order_label("region") == "normal_text"  # default
    assert SEMANTIC_CATEGORY["chart"] == "visual"
    assert "table" not in SHOULD_OCR and "text" in SHOULD_OCR


def test_cross_layout_full_width_block_in_two_columns():
    # two tall narrow text columns + one full-width block overlapping
    # neither: the wide block spans both columns → cross_layout → it is
    # weighted-inserted rather than breaking the column XY-cut.
    elements = [
        elem(20, 40, 185, 300, "text", 12),
        elem(215, 40, 380, 300, "text", 12),
        elem(20, 320, 380, 360, "text", 2),  # full width below columns
    ]
    order = sort(elements)
    # left column first, then right, wide block last
    assert order == [0, 1, 2]
