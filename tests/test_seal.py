"""Seal track tests: poly-sorted seal recognition (structure.rs:2009-2075,
sort_poly_boxes sorting.rs:100-118) and overall-OCR suppression of
seal-covered text."""

import numpy as np

from oar_ocr_spark.fixtures.render_structure import (
    render_structure_page,
    structure_page_truth,
)
from oar_ocr_spark.structure import extract_structure_page


def test_seal_text_recognized_in_poly_order():
    checked = 0
    for i in range(80):
        ref = f"seal_{i}"
        truth = structure_page_truth(ref)
        seals = [e for e in truth.elements if e.element_type == "seal"]
        if not seals:
            continue
        els = extract_structure_page(render_structure_page(ref))
        seal_els = {
            (int(e.bbox[0]), int(e.bbox[1])): e
            for e in els
            if e.element_type == "seal"
        }
        for t in seals:
            el = seal_els.get((t.x1, t.y1))
            if el is None:
                continue  # dropped by the deterministic score threshold (seal thr 0.45)
            # lines stacked vertically → poly order (y_min) = truth order
            assert el.text == " ".join(t.lines), (ref, el.text, t.lines)
            checked += 1
        if checked >= 3:
            return
    assert checked >= 1, "no page with a surviving seal element found"


def test_seal_content_not_duplicated_as_orphan_text():
    for i in range(80):
        ref = f"seal_{i}"
        truth = structure_page_truth(ref)
        seals = [e for e in truth.elements if e.element_type == "seal"]
        if not seals:
            continue
        els = extract_structure_page(render_structure_page(ref))
        if not any(e.element_type == "seal" for e in els):
            continue
        seal_lines = {ln for s in seals for ln in s.lines}
        for e in els:
            if e.element_type == "text":
                assert e.text not in seal_lines
        return
    raise AssertionError("no seal fixture found")
