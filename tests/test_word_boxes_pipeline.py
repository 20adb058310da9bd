"""return_word_box mode through the Spark DAG: per-character boxes lie
inside their detection box, are contiguous left→right, and one box per
recognized character."""

import numpy as np
import pytest

from oar_ocr_spark.local_ref import ExtractConfig
from oar_ocr_spark.pipeline import detect_crops_df, recognize_with_word_boxes
from oar_ocr_spark.schemas import DOCUMENTS_SCHEMA


def test_word_boxes_through_pipeline(spark):
    docs = [(f"wb{d}", [("media", None, f"wb{d}_m", 0)]) for d in range(6)]
    df = spark.createDataFrame(docs, schema=DOCUMENTS_SCHEMA)
    cfg = ExtractConfig()
    crops = detect_crops_df(df, cfg)
    rows = recognize_with_word_boxes(crops, cfg).collect()
    assert rows
    checked = 0
    for r in rows:
        if not r["text"]:
            continue
        wb = r["word_boxes"]
        assert len(wb) == len(r["text"])
        xs = [b[0] for b in wb]
        assert xs == sorted(xs)
        # boxes nested within the crop's detection box height
        for b in wb:
            assert b[2] > b[0] and b[3] > b[1]
        checked += 1
    assert checked >= 5


def test_word_boxes_blanked_with_text(spark):
    # when the score threshold blanks a row's text, its word boxes must
    # be blanked too (no empty-text rows with non-empty boxes)
    docs = [(f"wbt{d}", [("media", None, f"wbt{d}_m", 0)]) for d in range(3)]
    df = spark.createDataFrame(docs, schema=DOCUMENTS_SCHEMA)
    cfg = ExtractConfig(rec_score_threshold=0.99)
    rows = recognize_with_word_boxes(detect_crops_df(df, cfg), cfg).collect()
    assert rows
    for r in rows:
        assert r["text"] == ""
        assert r["word_boxes"] == []
