"""DB postprocess tests on synthetic heatmaps.

Semantics under test (all from /root/reference):
- db_bitmap.rs:84-149 filter chain order (min_size → box_thresh →
  unclip → sside < min_size+2 → scale/round/clamp)
- db_bitmap.rs:279-345 unclip delta = area*ratio/perimeter
- db_score.rs:33-53 box_score_fast region mean
- db_postprocess.rs:67-88 defaults
"""

import numpy as np

from oar_ocr_spark.operators.db_postprocess import (
    DBPostProcess,
    connected_components_boxes,
)


def heatmap(h, w, rects, val=1.0):
    m = np.zeros((h, w), dtype=np.float32)
    for (x1, y1, x2, y2) in rects:  # half-open pixel rects
        m[y1:y2, x1:x2] = val
    return m


def test_connected_components_order_and_extent():
    m = heatmap(40, 60, [(5, 5, 20, 12), (30, 20, 50, 30)]) > 0.5
    comps = connected_components_boxes(m)
    assert comps == [(5, 5, 19, 11), (30, 20, 49, 29)]


def test_connected_components_merge_same_row_region():
    # L-shape spanning rows must be one component
    m = np.zeros((10, 10), dtype=bool)
    m[2:4, 2:8] = True
    m[4:8, 2:4] = True
    comps = connected_components_boxes(m)
    assert comps == [(2, 2, 7, 7)]


def test_connected_components_diagonal_8conn():
    m = np.zeros((6, 6), dtype=bool)
    m[1, 1] = True
    m[2, 2] = True  # diagonal touch → same component under 8-connectivity
    assert connected_components_boxes(m) == [(1, 1, 2, 2)]


def test_basic_detection_with_unclip():
    pp = DBPostProcess(thresh=0.3, box_thresh=0.6, unclip_ratio=2.0)
    pred = heatmap(100, 100, [(20, 30, 60, 42)])  # w=40, h=12
    boxes, scores = pp(pred, src_w=100, src_h=100)
    assert boxes.shape == (1, 4)
    # score = filled 40×12 over the floor/ceil inclusive 41×13 region
    np.testing.assert_allclose(scores[0], (40 * 12) / (41 * 13), rtol=1e-5)
    # delta = (40*12*2)/(2*(40+12)) = 960/104 ≈ 9.2308 → rounds to 9
    x1, y1, x2, y2 = boxes[0]
    assert (x1, y1, x2, y2) == (20 - 9, 30 - 9, 60 + 9, 42 + 9)


def test_min_size_filter():
    pp = DBPostProcess(min_size=3.0, unclip_ratio=2.0)
    pred = heatmap(50, 50, [(10, 10, 12, 40)])  # 2px wide → min_side 2 < 3
    boxes, _ = pp(pred, 50, 50)
    assert len(boxes) == 0


def test_box_thresh_filter():
    pp = DBPostProcess(thresh=0.3, box_thresh=0.6, unclip_ratio=2.0)
    pred = heatmap(50, 50, [(10, 10, 30, 20)], val=0.5)  # above thresh, score 0.5 < 0.6
    boxes, _ = pp(pred, 50, 50)
    assert len(boxes) == 0


def test_max_candidates_limit():
    pp = DBPostProcess(max_candidates=2, unclip_ratio=2.0)
    pred = heatmap(100, 100, [(5, 5, 25, 15), (5, 30, 25, 40), (5, 55, 25, 65)])
    boxes, _ = pp(pred, 100, 100)
    assert len(boxes) == 2  # scan order keeps the two topmost


def test_scale_back_to_source_dims():
    # pred at 50x50, source 100x100 → boxes scale ×2 and clamp
    pp = DBPostProcess(unclip_ratio=2.0)
    pred = heatmap(50, 50, [(10, 10, 30, 20)])
    boxes, _ = pp(pred, src_w=100, src_h=100)
    assert boxes.shape == (1, 4)
    # unclip delta = (20*10*2)/(2*30) ≈ 6.67; scaled ×2 then rounded
    x1, y1, x2, y2 = boxes[0]
    assert x1 == round((10 - 6.666667) * 2) and y2 == round((20 + 6.666667) * 2)


def test_box_score_fast_region_mean():
    pp = DBPostProcess()
    pred = heatmap(20, 20, [(0, 0, 10, 10)], val=0.8)
    s = pp.box_score_fast(pred, np.array([0, 0, 10, 10], dtype=np.float32))
    # floor/ceil inclusive region [0..10]x[0..10] = 11x11 incl a 0 rim
    expected = (100 * 0.8) / (11 * 11)
    np.testing.assert_allclose(s, expected, rtol=1e-5)
