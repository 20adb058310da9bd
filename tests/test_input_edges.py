"""Input-edge probes (the verify SKILL's probe set, pinned): unknown
span kinds, null media_ref, duplicate offsets, empty spans arrays."""

from pyspark.sql import functions as F

from oar_ocr_spark.pipeline import extract_spans
from oar_ocr_spark.schemas import DOCUMENTS_SCHEMA


def _spans(df):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
        for r in df.collect()
    }


def test_unknown_kind_and_null_media_ref_dropped(spark):
    docs = [
        (
            "edge1",
            [
                ("text", "keep me", None, 0),
                ("weird", "mystery", None, 1),      # unknown kind: dropped
                ("media", None, None, 2),            # null media_ref: dropped
                ("text", "also kept", None, 3),
            ],
        )
    ]
    df = spark.createDataFrame(docs, schema=DOCUMENTS_SCHEMA)
    out = _spans(extract_spans(spark, df))
    assert out == {
        "edge1": [("text", "keep me", None, 0), ("text", "also kept", None, 1)]
    }


def test_duplicate_offsets_stable_order(spark):
    docs = [
        (
            "edge2",
            [
                ("text", "b", None, 1),
                ("text", "a", None, 1),  # duplicate offset
                ("text", "z", None, 0),
            ],
        )
    ]
    df = spark.createDataFrame(docs, schema=DOCUMENTS_SCHEMA)
    out = _spans(extract_spans(spark, df))
    texts = [t for _, t, _, _ in out["edge2"]]
    assert texts[0] == "z" and set(texts[1:]) == {"a", "b"}
    # deterministic across runs/partitionings
    out2 = _spans(extract_spans(spark, df, num_partitions=5))
    assert out == out2


def test_whitespace_and_empty_text_spans_pass_through(spark):
    docs = [("edge3", [("text", "", None, 0), ("text", "  ", None, 1)])]
    df = spark.createDataFrame(docs, schema=DOCUMENTS_SCHEMA)
    out = _spans(extract_spans(spark, df))
    # source-given text spans are pass-through, never dropped
    assert out == {"edge3": [("text", "", None, 0), ("text", "  ", None, 1)]}
