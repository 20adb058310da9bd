"""Table operator tests: cluster_positions (table_analyzer.rs:79-105),
cell matching cost semantics (stitching.rs:640-760,1465-1490), HTML
assembly (table_structure_decode.rs:37-166), and the synthetic grid
roundtrip against rendered table truth."""

import numpy as np

from oar_ocr_spark.fixtures.render_structure import (
    render_structure_page,
    structure_page_truth,
)
from oar_ocr_spark.operators.table import (
    TableCell,
    cluster_positions,
    l1_distance,
    match_cells_and_ocr,
    nearest_index,
    paddlex_distance,
    structure_tokens,
    table_structure_from_crop,
    wrap_table_html_with_content,
)
from oar_ocr_spark.structure import extract_structure_page


def test_cluster_positions():
    # chained tolerance clustering with means per cluster
    out = cluster_positions([10.0, 11.0, 12.0, 30.0, 31.0], 2.0)
    assert out == [11.0, 30.5]
    assert cluster_positions([], 2.0) == []
    assert cluster_positions([5.0], 2.0) == [5.0]


def test_nearest_index():
    assert nearest_index([0.0, 10.0, 20.0], 12.0) == 1
    assert nearest_index([], 5.0) == 0


def test_paddlex_distance():
    a = np.array([0, 0, 10, 10], dtype=np.float32)
    b = np.array([2, 1, 13, 12], dtype=np.float32)
    # dis = 2+1+3+2 = 8; dis2 = 3; dis3 = 5 → 8 + 3 = 11
    assert paddlex_distance(a, b) == 11.0
    assert l1_distance(a, b) == 8.0


def test_match_center_in_cell():
    cells = [
        TableCell(np.array([0, 0, 50, 20], dtype=np.float32), 0, 0),
        TableCell(np.array([50, 0, 100, 20], dtype=np.float32), 0, 1),
    ]
    ocr = [np.array([55, 5, 95, 15], dtype=np.float32)]
    assign = match_cells_and_ocr(cells, ocr)
    assert assign == {1: [0]}


def test_match_iou_fallback_with_tiebreak():
    cells = [
        TableCell(np.array([0, 0, 50, 20], dtype=np.float32), 0, 0),
        TableCell(np.array([50, 0, 100, 20], dtype=np.float32), 0, 1),
    ]
    # straddles the boundary, center at x=50 → IoA ≤ 0.7 path, larger
    # overlap with cell 0
    ocr = [np.array([20, 5, 60, 15], dtype=np.float32)]
    assign = match_cells_and_ocr(cells, ocr)
    assert assign == {0: [0]}


def test_structure_tokens_and_html():
    tokens = structure_tokens(2, 2)
    assert tokens == ["<tr>", "<td></td>", "<td></td>", "</tr>"] * 2
    html = wrap_table_html_with_content(tokens, ["a", None, "c", "d"])
    assert html.startswith("<html><body><table>")
    assert "<td>a</td>" in html and "<td></td>" in html and "<td>d</td>" in html
    assert html.endswith("</table></body></html>")


def test_grid_parse_roundtrip():
    # find a fixture page that contains a table and verify cell grid + texts
    found = 0
    for i in range(60):
        ref = f"tbl_{i}"
        truth = structure_page_truth(ref)
        tables = [e for e in truth.elements if e.element_type == "table"]
        if not tables:
            continue
        found += 1
        img = render_structure_page(ref)
        k = truth.orientation_class % 4
        upright = np.ascontiguousarray(np.rot90(img, k=k)) if k else img
        t = tables[0]
        crop = upright[t.y1 : t.y2, t.x1 : t.x2]
        tokens, cells = table_structure_from_crop(crop)
        assert len(cells) == t.n_rows * t.n_cols
        assert tokens.count("<td></td>") == t.n_rows * t.n_cols
        if found >= 3:
            break
    assert found >= 1, "no table fixture found in 60 pages"


def test_table_html_in_structure_extraction():
    checked = 0
    for i in range(60):
        ref = f"tbl_{i}"
        truth = structure_page_truth(ref)
        tables = [e for e in truth.elements if e.element_type == "table"]
        if not tables:
            continue
        els = extract_structure_page(render_structure_page(ref))
        table_els = {
            (int(e.bbox[0]), int(e.bbox[1])): e
            for e in els
            if e.element_type == "table"
        }
        for t in tables:
            el = table_els.get((t.x1, t.y1))
            if el is None:
                continue  # dropped by the deterministic score threshold
            assert el.html.startswith("<html><body><table>")
            assert el.html.count("<td>") == t.n_rows * t.n_cols
            for ct in t.cell_texts:
                assert f"<td>{ct}</td>" in el.html, (ref, ct, el.html)
            checked += 1
        if checked >= 3:
            return
    assert checked >= 1, "no structure page with surviving table element found"


# ---------------------------------------------------------------------------
# round-2 table subtree: wired/wireless classify, cell detection mode,
# cells->html token generation, cross-cell split + re-recognition
# ---------------------------------------------------------------------------

from oar_ocr_spark.fixtures.render import _render_region_block, region_width, REGION_H
from oar_ocr_spark.models.synthetic import BG
from oar_ocr_spark.operators.table import (
    classify_table_type,
    detect_table_cells,
    get_overlapping_cells,
    split_box_by_cells,
    table_cells_to_html_structure,
)

TABLE_GRID = 190
ROW_H = REGION_H + 14


def _draw_table(n_rows, n_cols, cell_texts, wired=True, col_w=120, span_row=None):
    """Standalone table crop like fixtures.render_structure._render_table;
    span_row draws that row's text as ONE strip across cells 0..1."""
    w = n_cols * col_w + 4
    h = n_rows * ROW_H + 6
    img = np.full((h, w), BG, dtype=np.uint8)
    gx1, gy1 = 2, 2
    gx2 = gx1 + col_w * n_cols
    for r in range(n_rows + 1):
        yy = gy1 + r * ROW_H
        img[yy : yy + 2, gx1:gx2] = TABLE_GRID
    if wired:
        for c in range(n_cols + 1):
            xx = gx1 + c * col_w
            img[gy1 : gy1 + n_rows * ROW_H + 2, xx : xx + 2] = TABLE_GRID
    for r in range(n_rows):
        if span_row == r:
            text = cell_texts[r * n_cols]
            block = _render_region_block(text)
            bw = min(region_width(len(text)), 2 * col_w - 10)
            # strip spans both cells 0 and 1: starts just inside cell 0
            img[gy1 + r * ROW_H + 7 : gy1 + r * ROW_H + 7 + REGION_H,
                gx1 + 4 : gx1 + 4 + bw] = block[:, :bw]
            continue
        for c in range(n_cols):
            text = cell_texts[r * n_cols + c]
            block = _render_region_block(text)
            bw = min(region_width(len(text)), col_w - 8)
            img[gy1 + r * ROW_H + 7 : gy1 + r * ROW_H + 7 + REGION_H,
                gx1 + c * col_w + 5 : gx1 + c * col_w + 5 + bw] = block[:, :bw]
    return img


def test_classify_table_type():
    wired = _draw_table(2, 2, ["ab", "cd", "ef", "gh"], wired=True)
    wireless = _draw_table(2, 2, ["ab", "cd", "ef", "gh"], wired=False)
    assert classify_table_type(wired)[0] == "wired"
    assert classify_table_type(wireless)[0] == "wireless"
    assert classify_table_type(np.full((40, 40), BG, dtype=np.uint8))[0] == "unknown"


def test_wireless_structure_infers_columns():
    texts = ["ab1", "cd2", "ef3", "gh4", "ij5", "kl6"]
    img = _draw_table(2, 3, texts, wired=False)
    tokens, cells = table_structure_from_crop(img)
    assert len(cells) == 6
    rows = {c.row for c in cells}
    cols = {c.col for c in cells}
    assert rows == {0, 1} and cols == {0, 1, 2}
    # each text strip's start must fall inside its inferred cell
    for r in range(2):
        for c in range(3):
            cell = cells[r * 3 + c]
            tx = 2 + c * 120 + 5
            assert cell.bbox[0] <= tx <= cell.bbox[2], (r, c, cell.bbox)


def test_detect_table_cells_interiors():
    img = _draw_table(2, 2, ["ab", "cd", "ef", "gh"], wired=True)
    boxes, scores = detect_table_cells(img)
    assert len(boxes) == 4 and len(scores) == 4
    # interiors are inset from grid lines
    assert all(b[0] >= 2 and b[1] >= 2 for b in boxes)


def test_table_cells_to_html_structure_with_spans():
    # 2x2 grid where the top cell spans both columns
    cells = [
        np.asarray([0.0, 0.0, 100.0, 30.0]),   # row 0: colspan 2
        np.asarray([0.0, 30.0, 50.0, 60.0]),   # row 1 col 0
        np.asarray([50.0, 30.0, 100.0, 60.0]), # row 1 col 1
    ]
    tokens, order = table_cells_to_html_structure(cells, 5.0)
    assert '<td colspan="2"></td>' in tokens
    assert [info.row for _, info in order] == [0, 1, 1]
    assert [src for src, _ in order] == [0, 1, 2]
    html = wrap_table_html_with_content(tokens, ["top", "a", "b"])
    assert '<td colspan="2">top</td>' in html
    assert html.count("<tr>") == 2
    assert html.count("<table>") == 1 and html.count("</table>") == 1


def test_split_box_by_cells_segments():
    # structure.rs:1699-1755: leading + per-cell + gap + trailing
    cells = [np.asarray([10.0, 0.0, 50.0, 30.0]), np.asarray([60.0, 0.0, 100.0, 30.0])]
    ob = np.asarray([0.0, 5.0, 110.0, 25.0])
    parts = split_box_by_cells(ob, [0, 1], cells)
    xs = [(p[0], p[2]) for p in parts]
    assert xs == [(0, 10), (10, 50), (50, 60), (60, 100), (100, 110)]
    assert get_overlapping_cells(ob, cells) == [0, 1]


def test_cross_cell_split_rerecognizes_both_cells():
    # a strip spanning cells (0,0) and (0,1) of a wired 3-row table is
    # split at the cell boundary and each half re-recognized
    from oar_ocr_spark.local_ref import ExtractConfig
    from oar_ocr_spark.structure import StructureElement, _analyze_table

    # col_w=60 so the 110px strip genuinely crosses the cell boundary
    texts = ["abcdefgh12", "(spanned)", "y2", "z3", "w4", "v5"]
    img = _draw_table(3, 2, texts, wired=True, col_w=60, span_row=0)
    page = np.full((img.shape[0] + 20, img.shape[1] + 20), BG, dtype=np.uint8)
    page[10 : 10 + img.shape[0], 10 : 10 + img.shape[1]] = img
    el = StructureElement(
        np.asarray([10.0, 10.0, 10.0 + img.shape[1], 10.0 + img.shape[0]], dtype=np.float32),
        "table",
        1.0,
    )
    cfg = ExtractConfig()
    html = _analyze_table(page, el, cfg)
    assert html
    # both spanned cells carry text, and together they cover the strip
    import re

    tds = re.findall(r"<td>([^<]*)</td>", html)
    row0 = tds[:2]
    assert all(row0), (row0, html)
    assert "abcd" in row0[0]
    # characters from the right half land in cell (0,1)
    assert any(ch in row0[1] for ch in "gh12"), row0
    # unspanned cells keep their own text
    assert "y2" in tds and "v5" in tds


def test_covered_ocr_suppression():
    from oar_ocr_spark.operators.text_refine import (
        split_cross_layout_boxes_with_origins,
        suppress_covered_boxes,
    )

    containers = np.asarray([[0, 0, 50, 100], [50, 0, 100, 100]], dtype=np.float32)
    det = np.asarray(
        [
            [10, 10, 90, 30],   # spans both containers -> split
            [12, 11, 49, 29],   # almost equal to the left split piece -> suppressed
            [10, 60, 40, 80],   # unrelated -> kept
        ],
        dtype=np.float32,
    )
    boxes, origins, is_split = split_cross_layout_boxes_with_origins(det, containers)
    assert is_split.sum() == 2
    keep = suppress_covered_boxes(boxes, origins, is_split)
    kept = boxes[keep]
    # the covered standalone box is gone; split pieces + unrelated kept
    assert len(kept) == 3
    assert not any(abs(b[0] - 12) < 0.5 and abs(b[1] - 11) < 0.5 for b in kept)


def test_fallback_block_ocr_recovers_thin_text(spark=None):
    # a text block whose only content is a 2px strip: detection sees
    # nothing, the fallback whole-block pass recovers the text
    from oar_ocr_spark.fixtures.render_structure import (
        structure_page_truth,
        render_structure_page,
    )
    from oar_ocr_spark.local_ref import ExtractConfig

    found = 0
    for i in range(150):
        ref = f"fb{i}"
        truth = structure_page_truth(ref)
        thins = [e for e in truth.elements if e.thin]
        if not thins:
            continue
        els = extract_structure_page(render_structure_page(ref), ExtractConfig())
        for th in thins:
            got = [
                e
                for e in els
                if abs(e.bbox[0] - th.x1) < 4 and abs(e.bbox[1] - th.y1) < 4
            ]
            if got:
                assert got[0].text == th.lines[0], (ref, th.lines[0], got[0].text)
                found += 1
        if found >= 3:
            break
    assert found >= 3, "corpus produced too few thin-text fixtures"


def test_table_orientation_corrects_rotated_crop():
    # table_analyzer.rs:353-384: a table crop carrying the orientation
    # cue rotated 90 degrees is classified and rotated upright before
    # structure analysis — identical HTML to the upright crop
    from oar_ocr_spark.local_ref import ExtractConfig
    from oar_ocr_spark.models.synthetic import ANCHOR, ANCHOR_SIZE
    from oar_ocr_spark.structure import StructureElement, _analyze_table

    texts = ["ab", "cd", "ef", "gh"]
    img = _draw_table(2, 2, texts, wired=True)
    img[4 : 4 + ANCHOR_SIZE, 4 : 4 + ANCHOR_SIZE] = ANCHOR

    def run(page_img):
        pad = np.full((page_img.shape[0] + 8, page_img.shape[1] + 8), BG, dtype=np.uint8)
        pad[4 : 4 + page_img.shape[0], 4 : 4 + page_img.shape[1]] = page_img
        el = StructureElement(
            np.asarray(
                [4.0, 4.0, 4.0 + page_img.shape[1], 4.0 + page_img.shape[0]],
                dtype=np.float32,
            ),
            "table",
            1.0,
        )
        return _analyze_table(pad, el, ExtractConfig())

    upright_html = run(img)
    rotated_html = run(np.ascontiguousarray(np.rot90(img, k=-1)))
    assert upright_html
    assert upright_html == rotated_html
    for t in texts:
        assert t in upright_html


def test_combine_rectangles_kmeans_merges_to_target():
    from oar_ocr_spark.operators.table import combine_rectangles_kmeans

    # two tight clusters of 3 rects each -> target 2 unions
    rects = [np.asarray(r, dtype=np.float32) for r in [
        (0, 0, 10, 10), (2, 1, 12, 11), (1, 2, 11, 12),
        (100, 100, 110, 110), (102, 101, 112, 111), (101, 102, 111, 112),
    ]]
    out = combine_rectangles_kmeans(rects, 2)
    assert len(out) == 2
    out = sorted(out, key=lambda b: b[0])
    np.testing.assert_allclose(out[0], [0, 0, 12, 12])
    np.testing.assert_allclose(out[1], [100, 100, 112, 112])
    # target >= n passes through
    assert len(combine_rectangles_kmeans(rects, 10)) == 6
    assert combine_rectangles_kmeans([], 3) == []


def test_reprocess_table_cells_with_ocr_paths():
    from oar_ocr_spark.operators.table import reprocess_table_cells_with_ocr

    cells = [np.asarray(c, dtype=np.float32) for c in [(0, 0, 50, 20), (50, 0, 100, 20)]]
    # exact count: unchanged
    out = reprocess_table_cells_with_ocr(cells, [0.9, 0.8], [], 2)
    assert len(out) == 2
    # fewer cells than target + an uncovered OCR box: supplemented
    ocr = [np.asarray((0, 30, 40, 45), dtype=np.float32)]
    out = reprocess_table_cells_with_ocr(cells, [0.9, 0.8], ocr, 3)
    assert len(out) == 3
    # no detected cells: cluster the OCR boxes
    out = reprocess_table_cells_with_ocr([], [], ocr * 3, 1)
    assert len(out) == 1
    # more cells than target: top-N by score, then merge with misses
    many = cells + [np.asarray((0, 40, 100, 60), dtype=np.float32)]
    out = reprocess_table_cells_with_ocr(many, [0.9, 0.8, 0.7], [], 2)
    assert len(out) == 2
