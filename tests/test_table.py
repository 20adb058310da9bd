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
