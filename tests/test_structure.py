"""Structure-track tests: layout detection roundtrip, golden equality of
the Spark structure DAG vs the single-process core, ordering and
markdown rules."""

import numpy as np
import pytest

from oar_ocr_spark.fixtures.render_structure import (
    CLASS_ID,
    render_structure_page,
    structure_page_truth,
)
from oar_ocr_spark.local_ref import ExtractConfig
from oar_ocr_spark.structure import (
    detect_layout,
    elements_to_markdown,
    extract_structure_page,
)


def test_layout_detection_finds_all_truth_elements():
    for i in range(10):
        ref = f"ld_{i}"
        truth = structure_page_truth(ref)
        img = render_structure_page(ref)
        # detect on the upright page
        k = truth.orientation_class % 4
        upright = np.ascontiguousarray(np.rot90(img, k=k)) if k else img
        boxes, classes, scores = detect_layout(upright)
        assert len(boxes) == len(truth.elements)
        got = {
            (int(b[0]), int(b[1]), int(b[2]), int(b[3]), int(c))
            for b, c in zip(boxes, classes)
        }
        exp = {
            (e.x1, e.y1, e.x2, e.y2, CLASS_ID[e.element_type]) for e in truth.elements
        }
        assert got == exp


def test_structure_page_deterministic():
    a = extract_structure_page(render_structure_page("det_1"))
    b = extract_structure_page(render_structure_page("det_1"))
    assert [(e.element_type, e.text, e.order_index) for e in a] == [
        (e.element_type, e.text, e.order_index) for e in b
    ]


def test_order_indices_sequential_one_based():
    els = extract_structure_page(render_structure_page("ord_3"))
    assert [e.order_index for e in els] == list(range(1, len(els) + 1))


def test_text_elements_carry_joined_text():
    for i in range(6):
        els = extract_structure_page(render_structure_page(f"tx_{i}"))
        for e in els:
            if e.element_type in ("doc_title", "paragraph_title") and e.score >= 0.5:
                assert e.text != ""
            if e.element_type == "image":
                assert e.text == ""


def test_markdown_rules():
    els = extract_structure_page(render_structure_page("md_2"))
    md = elements_to_markdown(els)
    for e in els:
        if e.element_type == "doc_title":
            assert f"# {e.text}" in md
        if e.element_type == "header":
            assert e.text == "" or e.text not in md.split("\n\n")


def test_spark_structure_matches_local_golden(spark):
    from oar_ocr_spark.pipeline_structure import extract_structure
    from oar_ocr_spark.schemas import DOCUMENTS_SCHEMA

    docs = []
    for d in range(12):
        spans = [
            ("text", f"intro {d}", None, 0),
            ("media", None, f"stdoc{d}_m1", 1),
            ("media", None, f"stdoc{d}_m2", 2),
        ]
        docs.append((f"stdoc{d}", spans))
    df = spark.createDataFrame(docs, schema=DOCUMENTS_SCHEMA)
    out = extract_structure(spark, df, num_partitions=3)
    rows = {(r["doc_id"], r["media_ref"]): r for r in out.collect()}
    assert len(rows) == 24
    cfg = ExtractConfig()
    for d in (0, 5, 11):
        for m in (1, 2):
            ref = f"stdoc{d}_m{m}"
            row = rows[(f"stdoc{d}", ref)]
            golden = extract_structure_page(render_structure_page(ref), cfg)
            got = [
                (e["element_type"], e["text"], e["order_index"], e["num_lines"])
                for e in row["elements"]
            ]
            exp = [
                (e.element_type, e.text, e.order_index, e.num_lines) for e in golden
            ]
            assert got == exp
            assert row["markdown"] == elements_to_markdown(golden)


def test_spark_structure_partition_invariance(spark):
    from oar_ocr_spark.pipeline_structure import extract_structure
    from oar_ocr_spark.schemas import DOCUMENTS_SCHEMA

    docs = [
        (f"pi{d}", [("media", None, f"pi{d}_m", 0)]) for d in range(8)
    ]
    df = spark.createDataFrame(docs, schema=DOCUMENTS_SCHEMA)

    def snap(np_):
        out = extract_structure(spark, df, num_partitions=np_)
        return {
            r["media_ref"]: (tuple(r["elements"]), r["markdown"]) for r in out.collect()
        }

    assert snap(2) == snap(7)
