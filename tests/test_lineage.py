"""Lineage + checkpoint/resume tests: a failed run must resume without
reprocessing committed buckets, and stage metrics must record
per-partition rows/timings."""

import json
import os

import pytest
from pyspark.sql import functions as F

from oar_ocr_spark.fixtures.corpus import generate_documents
from oar_ocr_spark.lineage import (
    instrument_map_in_pandas,
    read_lineage,
    read_stage_metrics,
    run_extraction_job,
)
from oar_ocr_spark.schemas import DOCUMENTS_SCHEMA


def docs_df(spark, docs):
    rows = [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in docs]
    return spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)


@pytest.fixture()
def corpus_df(spark):
    return docs_df(spark, generate_documents(60, seed=21))


def test_resume_skips_completed_buckets(spark, corpus_df, tmp_path):
    results = str(tmp_path / "results")
    lineage = str(tmp_path / "lineage")
    # first run dies after 3 committed buckets
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extraction_job(
            spark, corpus_df, results, lineage, n_buckets=6, fail_after_bucket=3
        )
    first = read_lineage(spark, lineage).count()
    assert first == 3
    # resume: completes only the remaining buckets
    summary = run_extraction_job(spark, corpus_df, results, lineage, n_buckets=6)
    assert summary["skipped_buckets"] == 3
    assert summary["processed_buckets"] == 3
    lin = read_lineage(spark, lineage)
    assert lin.count() == 6
    # all docs present exactly once in the results
    out = spark.read.parquet(results)
    assert out.select("doc_id").distinct().count() == corpus_df.count()
    assert out.count() == corpus_df.count()
    # lineage doc counts add up
    assert lin.agg(F.sum("n_docs")).collect()[0][0] == corpus_df.count()


def test_rerun_of_complete_job_is_noop(spark, corpus_df, tmp_path):
    results = str(tmp_path / "results")
    lineage = str(tmp_path / "lineage")
    run_extraction_job(spark, corpus_df, results, lineage, n_buckets=4)
    summary = run_extraction_job(spark, corpus_df, results, lineage, n_buckets=4)
    assert summary["processed_buckets"] == 0
    assert summary["skipped_buckets"] == 4


def test_stage_metrics_instrumentation(spark, tmp_path):
    metrics_dir = str(tmp_path / "metrics")

    def double(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.concat([pdf, pdf], ignore_index=True)

    df = spark.range(0, 100, 1, 4).select(F.col("id"))
    wrapped = instrument_map_in_pandas(double, "double_stage", metrics_dir)
    out = df.mapInPandas(wrapped, "id long")
    assert out.count() == 200
    m = read_stage_metrics(spark, metrics_dir)
    rows = m.collect()
    assert {r["stage"] for r in rows} == {"double_stage"}
    assert sum(r["rows_in"] for r in rows) == 100
    assert sum(r["rows_out"] for r in rows) == 200
    assert all(r["elapsed_ms"] >= 0 for r in rows)
    assert len({r["partition_id"] for r in rows}) == 4
