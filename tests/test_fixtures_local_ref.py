"""End-to-end tests of the synthetic renderer + single-process reference
pipeline: the extraction must recover the ground-truth texts in
sort_quad_boxes reading order for every page, under every orientation
class and line-flip combination."""

import numpy as np
import pytest

from oar_ocr_spark.fixtures.corpus import generate_documents, interleaved_docs_from_plain
from oar_ocr_spark.fixtures.render import page_truth, render_page
from oar_ocr_spark.local_ref import (
    ExtractConfig,
    extract_document_spans,
    extract_page,
    preprocess_page,
)
from oar_ocr_spark.models.synthetic import classify_orientation
from oar_ocr_spark.operators.sorting import sort_quad_boxes


def expected_page_texts(ref: str) -> list[str]:
    truth = page_truth(ref)
    boxes = np.array([[r.x1, r.y1, r.x2, r.y2] for r in truth.regions], dtype=np.float32)
    order = sort_quad_boxes(boxes)
    return [truth.regions[k].text for k in order]


@pytest.mark.parametrize("i", range(60))
def test_extract_page_recovers_truth(i):
    ref = f"fixture_page_{i}"
    got = [t for t, _ in extract_page(render_page(ref))]
    assert got == expected_page_texts(ref)


def test_orientation_classifier_all_classes():
    seen = set()
    for i in range(40):
        ref = f"orient_{i}"
        truth = page_truth(ref)
        img = render_page(ref)
        assert classify_orientation(img) == truth.orientation_class
        seen.add(truth.orientation_class)
    assert seen == {0, 1, 2, 3}


def test_preprocess_restores_upright_dims():
    cfg = ExtractConfig()
    for i in range(12):
        ref = f"pp_{i}"
        truth = page_truth(ref)
        upright, cls = preprocess_page(render_page(ref), cfg)
        assert cls == truth.orientation_class
        assert upright.shape == (truth.height, truth.width)


def test_extract_document_spans_interleaving():
    spans = [
        {"kind": "text", "text": "hello", "media_ref": None, "offset": 0},
        {"kind": "media", "text": None, "media_ref": "docX_m1", "offset": 1},
        {"kind": "text", "text": "world", "media_ref": None, "offset": 2},
    ]
    out = extract_document_spans(spans)
    exp_media = expected_page_texts("docX_m1")
    assert [s["text"] for s in out] == ["hello", *exp_media, "world"]
    assert [s["order"] for s in out] == list(range(len(out)))
    assert out[0]["kind"] == "text" and out[1]["kind"] == "media"
    assert out[1]["media_ref"] == "docX_m1"


def test_extract_document_spans_handles_unordered_offsets():
    spans = [
        {"kind": "text", "text": "b", "media_ref": None, "offset": 1},
        {"kind": "text", "text": "a", "media_ref": None, "offset": 0},
    ]
    out = extract_document_spans(spans)
    assert [s["text"] for s in out] == ["a", "b"]


def test_generate_documents_deterministic_and_skewed():
    docs1 = generate_documents(300, seed=42)
    docs2 = generate_documents(300, seed=42)
    assert docs1 == docs2
    sizes = [len(d["spans"]) for d in docs1]
    assert max(sizes) == 200  # heavy tail present
    kinds = [s["kind"] for d in docs1 for s in d["spans"]]
    assert 0.2 < kinds.count("media") / len(kinds) < 0.75


def test_interleaved_from_plain():
    spans = interleaved_docs_from_plain("d1", " ".join(f"w{i}" for i in range(40)))
    # 40 words → 5 chunks of 8; media after chunks 3 (i=2) → offsets strictly increasing
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    assert sum(1 for s in spans if s["kind"] == "media") == 1
    assert spans[3] == {"kind": "media", "text": None, "media_ref": "d1_m2", "offset": 3}
