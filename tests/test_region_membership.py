"""Region-block membership (PP-DocBlockLayout analog,
structure.rs:44, :2109-2168): elements in a two-column page are
assigned to their column's region block by best IoA ≥ 0.1; out-of-
region elements get -1."""

from oar_ocr_spark.fixtures.render_structure import (
    render_structure_page,
    structure_page_truth,
)
from oar_ocr_spark.structure import extract_structure_page


def test_two_column_elements_carry_region_membership():
    checked = 0
    for i in range(80):
        ref = f"region_{i}"
        truth = structure_page_truth(ref)
        regions = [e for e in truth.elements if e.element_type == "region"]
        if len(regions) != 2:
            continue
        els = extract_structure_page(render_structure_page(ref))
        assert all(e.element_type != "region" for e in els)
        left_x = min(r.x1 for r in regions)
        in_col = [e for e in els if e.region_index >= 0]
        out_col = [e for e in els if e.region_index < 0]
        if not in_col:
            continue
        # members of the same column share a region index; the two
        # columns get different indices
        by_region: dict[int, set[int]] = {}
        for e in in_col:
            by_region.setdefault(e.region_index, set()).add(int(e.bbox[0]))
        for xs in by_region.values():
            assert len(xs) == 1  # one column x-origin per region
        # header/doc_title/footer span the full width → not column members
        for e in out_col:
            assert e.element_type in (
                "doc_title", "header", "footer", "seal", "text",
                "paragraph_title", "image", "figure_title", "table", "formula",
            )
        checked += 1
        if checked >= 3:
            return
    assert checked >= 1, "no two-column page with regions found"
