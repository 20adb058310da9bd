"""Result-level span filters/aggregations (result.rs:53-97) and the
text postprocess chain (domain/structure.rs:1294-1641)."""

import numpy as np
from pyspark.sql import functions as F

from oar_ocr_spark.functions.results import (
    average_confidence,
    concatenated_text,
    confident_spans,
    doc_text_stats,
    recognized_spans,
)
from oar_ocr_spark.operators.text_refine import (
    clean_ocr_text,
    dehyphenate,
    deduplicate_sections,
    fix_merged_words,
    format_first_line,
    format_text_block,
    postprocess_text,
)


def _results_df(spark):
    spans = [
        ("text", "intro", None, 0, None),
        ("media", "abc", "m0", 1, 0.95),
        ("media", "", "m0", 2, 0.10),
        ("media", "low", "m0", 3, 0.20),
        ("media", None, "m0", 4, None),
    ]
    return spark.createDataFrame(
        [("d1", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,order:int,confidence:float>>",
    )


def test_recognized_and_confident_filters(spark):
    df = _results_df(spark)
    rec = recognized_spans(df).collect()[0]["spans"]
    assert [s["text"] for s in rec] == ["intro", "abc", "low"]
    conf = confident_spans(df, 0.5).collect()[0]["spans"]
    # pass-through text (null conf) kept; low-confidence media dropped
    assert [s["text"] for s in conf] == ["intro", "abc"]


def test_concat_and_average_confidence(spark):
    df = _results_df(spark)
    out = df.select(
        concatenated_text(F.col("spans")).alias("t"),
        F.round(average_confidence(F.col("spans")), 4).alias("c"),
    ).collect()[0]
    assert out["t"] == "intro abc low"
    assert abs(out["c"] - round((0.95 + 0.10 + 0.20) / 3, 4)) < 1e-6
    stats = doc_text_stats(df).collect()[0]
    assert stats["n_spans"] == 5 and stats["n_recognized"] == 3


def test_extraction_carries_confidence(spark):
    from oar_ocr_spark.fixtures.corpus import generate_documents
    from oar_ocr_spark.pipeline import extract_spans
    from oar_ocr_spark.schemas import DOCUMENTS_SCHEMA

    docs = generate_documents(6, seed=21)
    df = spark.createDataFrame(
        [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in docs],
        schema=DOCUMENTS_SCHEMA,
    )
    rows = extract_spans(spark, df).collect()
    media = [s for r in rows for s in r["spans"] if s["kind"] == "media"]
    texts = [s for r in rows for s in r["spans"] if s["kind"] == "text"]
    assert media and all(s["confidence"] is not None and s["confidence"] > 0 for s in media)
    assert texts and all(s["confidence"] is None for s in texts)


def test_clean_and_dehyphenate():
    assert clean_ocr_text("hel-\nlo\nworld") == "hello world"
    assert dehyphenate("exam-\nple") == "example"
    assert dehyphenate("exam-\nPle") == "exam-\nPle"  # uppercase: keep
    assert dehyphenate("http://a-\nb") == "http://a-\nb"  # URL context kept
    assert dehyphenate("well-known") == "well-known"


def test_fix_merged_words_patterns():
    assert fix_merged_words("encoder'sfeature") == "encoder's feature"
    assert fix_merged_words("modelThe") == "model The"  # lower→Upper word
    assert fix_merged_words("48.1%AP") == "48.1% AP"
    assert fix_merged_words("a1b") == "a 1b"  # letter-digit-letter
    # bug-compatible with the reference code (its RT-DETRis comment is
    # aspirational — Upper→lower never fires, structure.rs:1512-1520)
    assert fix_merged_words("RT-DETRis") == "RT-DETRis"
    assert fix_merged_words("RT-DETRv3") == "RT-DETRv3"  # acronym kept


def test_postprocess_text_whitespace():
    assert postprocess_text("a  b\t\nc") == "a b c"
    # bug-compatible: the reference's punctuation branch leaves in_space
    # set, so the space AFTER the pulled-back comma is consumed too
    # (structure.rs:1588-1592)
    assert postprocess_text("word , next") == "word,next"
    assert postprocess_text("end.next") == "end.next"


def test_format_blocks_and_sections():
    assert format_text_block("a-\nb\nc") == "ab\n\nc"
    out = format_first_line("abstract rest of text", " ", ["abstract", "摘要"], "## ")
    assert out.startswith("## abstract\n")
    md = "**Abstract**\nbody\n**Abstract**\ntail"
    assert deduplicate_sections(md) == "**Abstract**\nbody\ntail"


def test_postprocess_markdown_chain():
    from oar_ocr_spark.operators.text_refine import postprocess_markdown

    md = "\n".join([
        "# Title",
        "$$",
        "$$",
        "",
        "plain  text   here",
        "$$",
        "E = mc^2 costs $5",
        "$$",
        "```",
        "code   stays",
        "```",
        "| table | row |",
    ])
    out = postprocess_markdown(md)
    assert "# Title" in out
    # empty formula block dropped
    assert out.count("$$") == 2
    # plain text whitespace normalized; markdown-syntax lines untouched
    assert "plain text here" in out
    assert "code   stays" in out
    assert "| table | row |" in out
    # bare dollars escaped inside the surviving formula block
    assert "costs \\$5" in out
