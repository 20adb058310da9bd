"""Preprocess metadata invariants (preprocess.rs:9-12, 87-91):
orientation correction carries back-mapping metadata; rectification
disables it (rotation=None)."""

import numpy as np

from oar_ocr_spark.fixtures.render import page_truth, render_page
from oar_ocr_spark.local_ref import ExtractConfig, extract_page, preprocess_page_full
from oar_ocr_spark.operators.geometry import rotate_back_to_original


def test_rotation_metadata_present_without_rectification():
    cfg = ExtractConfig()
    for i in range(8):
        ref = f"inv_{i}"
        truth = page_truth(ref)
        img = render_page(ref)
        upright, cls, rotation = preprocess_page_full(img, cfg)
        assert cls == truth.orientation_class
        assert rotation == (cls * 90, truth.width, truth.height)


def test_rectification_disables_back_mapping():
    cfg = ExtractConfig(use_rectification=True)
    img = render_page("inv_rect")
    upright, _cls, rotation = preprocess_page_full(img, cfg)
    assert rotation is None  # rectified ⇒ results stay in rectified space


def test_rectified_extraction_identical_for_flat_pages():
    # synthetic pages are flat, so the identity rectifier must not
    # change the extraction result — but the metadata contract differs
    ref = "inv_same"
    a = extract_page(render_page(ref), ExtractConfig())
    b = extract_page(render_page(ref), ExtractConfig(use_rectification=True))
    assert a == b


def test_rotate_back_maps_upright_boxes_to_source():
    # end-to-end: detected upright boxes + rotation metadata map back
    # into source-image coordinates (ocr.rs:899-926 semantics)
    from oar_ocr_spark.local_ref import detect_page

    cfg = ExtractConfig()
    for i in range(6):
        ref = f"invmap_{i}"
        truth = page_truth(ref)
        if truth.orientation_class == 0:
            continue
        img = render_page(ref)
        upright, cls, rotation = preprocess_page_full(img, cfg)
        boxes, _ = detect_page(upright, cfg)
        assert rotation is not None
        angle, rw, rh = rotation
        back = rotate_back_to_original(boxes, angle, rw, rh)
        H, W = img.shape
        assert (back[:, 0] >= 0).all() and (back[:, 2] <= W + 0.5).all()
        assert (back[:, 1] >= 0).all() and (back[:, 3] <= H + 0.5).all()
        # round-trip: mapping the source-space boxes forward again must
        # land on the upright boxes (inverse relationship)
        k = cls % 4
        rot_img_boxes = back
        x1, y1, x2, y2 = (rot_img_boxes[:, j] for j in range(4))
        if k == 1:  # correction was 90° CCW: source (x,y) -> (y, W-x)
            fwd = np.stack([y1, W - x2, y2, W - x1], axis=1)
        elif k == 2:
            fwd = np.stack([W - x2, H - y2, W - x1, H - y1], axis=1)
        else:  # k == 3: correction was 90° CW: (x,y) -> (H-y, x)
            fwd = np.stack([H - y2, x1, H - y1, x2], axis=1)
        np.testing.assert_allclose(fwd, boxes, atol=1e-3)


def test_rectification_unwarps_exactly():
    # the UVDoc stand-in now performs a REAL unwarp: the vertical sag
    # (A in 12..16 > half the line height) breaks the unrectified
    # decode, and rectification recovers the exact drawn text
    from oar_ocr_spark.fixtures.render import page_truth, render_page
    from oar_ocr_spark.local_ref import ExtractConfig, extract_page

    rectified_ok = 0
    raw_wrong = 0
    for i in range(12):
        ref = f"warp:t{i}"
        exp = [r.text for r in page_truth(ref).regions]
        img = render_page(ref)
        got = [t for t, _ in extract_page(img, ExtractConfig(use_rectification=True))]
        assert got == exp, (ref, exp, got)
        rectified_ok += 1
        raw = [t for t, _ in extract_page(img, ExtractConfig())]
        if raw != exp:
            raw_wrong += 1
    assert rectified_ok == 12
    assert raw_wrong >= 8  # the warp genuinely matters


def test_rectifier_identity_on_flat_pages():
    import numpy as np

    from oar_ocr_spark.fixtures.render import render_page
    from oar_ocr_spark.local_ref import _rectify

    img = render_page("flat_0")
    assert np.array_equal(_rectify(img), img)


def test_batch_size_validation_bounds():
    # builder validation 1..=4096 (ocr.rs:93,419-430)
    import pytest

    from oar_ocr_spark.local_ref import ExtractConfig

    with pytest.raises(ValueError, match="image_batch_size"):
        ExtractConfig(image_batch_size=0)
    with pytest.raises(ValueError, match="region_batch_size"):
        ExtractConfig(region_batch_size=4097)
    cfg = ExtractConfig(image_batch_size=1, region_batch_size=4096)
    assert cfg.region_batch_size == 4096


def test_region_batch_chunking_is_result_invariant(spark):
    from oar_ocr_spark.fixtures.corpus import generate_documents
    from oar_ocr_spark.local_ref import ExtractConfig
    from oar_ocr_spark.pipeline import extract_spans
    from oar_ocr_spark.schemas import DOCUMENTS_SCHEMA

    docs = generate_documents(8, seed=3)
    df = spark.createDataFrame(
        [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in docs],
        schema=DOCUMENTS_SCHEMA,
    )
    def spans(cfg):
        return {
            r["doc_id"]: [(s["kind"], s["text"], s["order"]) for s in r["spans"]]
            for r in extract_spans(spark, df, cfg).collect()
        }
    assert spans(ExtractConfig(region_batch_size=2)) == spans(ExtractConfig(region_batch_size=4096))
