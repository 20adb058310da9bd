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


def test_formula_latex_derives_from_glyph_geometry():
    # the PP-FormulaNet stand-in must decode STRUCTURE, not just glyph
    # content: raised strip → ^{}, lowered → _{}, bar → \frac{}{} —
    # scan refs until every pattern (incl. plain) has been pinned
    from oar_ocr_spark.fixtures.render_structure import structure_page_truth

    want_of = {
        "plain": lambda s: "\\mathrm{%s}" % s[1],
        "sup": lambda s: "%s^{%s}" % (s[1], s[2]),
        "sub": lambda s: "%s_{%s}" % (s[1], s[2]),
        "frac": lambda s: "\\frac{%s}{%s}" % (s[1], s[2]),
        # mixed sequence: each script attaches to ITS preceding base
        "mix": lambda s: "%s^{%s} %s_{%s}" % (s[1], s[2], s[3], s[4]),
        # nested: the deeper script nests INSIDE the shallower one
        "nest": lambda s: "%s^{%s^{%s}}" % (s[1], s[2], s[3]),
        # radical: operand only below the vinculum (vs frac both sides)
        "sqrt": lambda s: "\\sqrt{%s}" % s[1],
    }
    seen: set[str] = set()
    i = 0
    while len(seen) < len(want_of) and i < 500:
        ref = f"{i}_m0"
        i += 1
        truth = structure_page_truth(ref)
        fs = [el for el in truth.elements if el.element_type == "formula"]
        if not fs:
            continue
        els = extract_structure_page(render_structure_page(ref))
        got = [el for el in els if el.element_type == "formula"]
        assert len(got) == len(fs)
        for tel, gel in zip(fs, got):
            assert gel.text == want_of[tel.formula_spec[0]](tel.formula_spec)
            assert gel.score == 1.0  # conf-1.0 injection (structure.rs:2765)
            seen.add(tel.formula_spec[0])
    assert seen == set(want_of)


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


# ---------------------------------------------------------------------------
# round 2: continuation flags, multi-page concat, to_html
# ---------------------------------------------------------------------------

def _el(etype, x1, y1, x2, y2, text="", html=""):
    import numpy as np
    from oar_ocr_spark.structure import StructureElement

    e = StructureElement(np.asarray([x1, y1, x2, y2], dtype=np.float32), etype, 1.0)
    e.text = text
    e.html = html
    return e


def test_continuation_flags_ported_heuristics():
    from oar_ocr_spark.structure import calculate_continuation_flags

    # first text at left margin (<=5% of width) -> new paragraph start;
    # last text stops before 90% of width -> paragraph complete
    els = [_el("text", 10, 10, 500, 40, "a"), _el("text", 10, 50, 700, 80, "b")]
    start, end = calculate_continuation_flags(els, page_width=1000.0)
    assert start is True and end is True
    # indented first + flush-right last -> continuation on both sides
    els = [_el("text", 80, 10, 500, 40, "a"), _el("text", 10, 50, 950, 80, "b")]
    start, end = calculate_continuation_flags(els, page_width=1000.0)
    assert start is False and end is False
    # no text-like elements -> (True, True)
    assert calculate_continuation_flags([_el("image", 0, 0, 10, 10)]) == (True, True)


def test_concatenate_markdown_pages_split_paragraph():
    from oar_ocr_spark.structure import concatenate_markdown_pages

    pages = [
        ("first page text that runs to", (True, False)),   # unfinished
        ("the edge and continues here", (False, True)),    # continues
        ("a fresh paragraph", (True, True)),
    ]
    out = concatenate_markdown_pages(pages)
    assert out == (
        "first page text that runs to the edge and continues here"
        "\n\na fresh paragraph"
    )
    # empty page forwards its end flag without emitting anything
    pages = [("para runs on", (True, False)), ("", (False, False)), ("tail", (False, True))]
    assert concatenate_markdown_pages(pages) == "para runs on tail"
    # chinese boundary joins without a space
    pages = [("前文", (True, False)), ("后文", (False, True))]
    assert concatenate_markdown_pages(pages) == "前文后文"


def test_document_markdown_catalyst_matches_python(spark):
    import itertools

    from oar_ocr_spark.pipeline_structure import document_markdown
    from oar_ocr_spark.structure import concatenate_markdown_pages

    # include newline boundaries and a CJK boundary — the Catalyst fold
    # must trim ALL whitespace like the Python twin, not just spaces
    mds = ["alpha beta", "gamma", "", "\nlead nl", "trail nl\n", "前文"]
    rows = []
    expected = {}
    doc = 0
    for md1, e1, md2, s2 in itertools.product(mds, [True, False], mds, [True, False]):
        doc_id = f"d{doc}"
        doc += 1
        pages = [(md1, (True, e1)), (md2, (s2, True))]
        expected[doc_id] = concatenate_markdown_pages(pages)
        rows.append((doc_id, 0, "m0", md1, True, e1))
        rows.append((doc_id, 1, "m1", md2, s2, True))
    # single-page docs: the Python twin's early-return branch must
    # strip exactly like the fold's final trim (whitespace-carrying
    # markdown was the latent divergence — ADVICE r2)
    for md1 in mds:
        doc_id = f"d{doc}"
        doc += 1
        expected[doc_id] = concatenate_markdown_pages([(md1, (True, True))])
        rows.append((doc_id, 0, "m0", md1, True, True))
    df = spark.createDataFrame(
        rows, "doc_id string, offset int, media_ref string, markdown string, para_start boolean, para_end boolean"
    )
    got = {r["doc_id"]: r["markdown"] for r in document_markdown(df).collect()}
    assert got == expected


def test_elements_to_html():
    from oar_ocr_spark.structure import elements_to_html

    els = [
        _el("doc_title", 0, 0, 10, 10, "T<itle>"),
        _el("paragraph_title", 0, 20, 10, 30, "Sec"),
        _el("text", 0, 40, 10, 50, "body & more"),
        _el("table", 0, 60, 10, 70, html="<html><body><table><tr><td>x</td></tr></table></body></html>"),
        _el("formula", 0, 80, 10, 90, "E=mc^2"),
        _el("image", 0, 100, 10, 110),
        _el("seal", 0, 120, 10, 130, "official"),
        _el("footer", 0, 140, 10, 150, "pg 1"),
    ]
    html = elements_to_html(els)
    assert "<h1>T&lt;itle&gt;</h1>" in html
    assert "<h2>Sec</h2>" in html
    assert "<p>body &amp; more</p>" in html
    assert '<table border="1" style="border-collapse: collapse;"><tr><td>x</td></tr></table>' in html
    assert '<p class="formula">$$E=mc^2$$</p>' in html
    assert '<img alt="Figure" />' in html
    assert '<figure class="seal">' in html and "official" in html
    assert "<footer>pg 1</footer>" in html
    assert html.startswith("<!DOCTYPE html>") and html.endswith("</body>\n</html>")
