"""Physical-plan shape pins: the scale properties BENCH.md claims are
asserted here so a refactor cannot silently regress them."""

import contextlib
import io

from pyspark.sql import functions as F

from oar_ocr_spark.fixtures.corpus import generate_documents
from oar_ocr_spark.pipeline import detect_crops_from_flat, extract_spans
from oar_ocr_spark.local_ref import ExtractConfig
from oar_ocr_spark.schemas import DOCUMENTS_SCHEMA


def _parquet_docs(spark, tmp_path, docs):
    rows = [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in docs]
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_extraction_plan_two_python_boundaries_and_pruned_scan(spark, tmp_path):
    docs = _parquet_docs(spark, tmp_path, generate_documents(12, seed=9))
    out = extract_spans(spark, docs, persist_input=False)
    plan = _plan(out)
    # exactly two Python boundaries: detect and recognize (formatted
    # explain lists each node once in the tree and once in the detail
    # section — count the numbered detail entries)
    import re

    boundaries = re.findall(r"\(\d+\) MapInPandas", plan)
    assert len(boundaries) == 2, plan
    # the doc-id preservation branch scans doc_id ONLY (column pruning
    # reaches the parquet scan)
    assert "ReadSchema: struct<doc_id:string>" in plan, plan
    # no cartesian products anywhere in the extraction DAG
    assert "CartesianProduct" not in plan


def test_page_store_join_shuffles_above_broadcast_threshold(spark, tmp_path):
    # at corpus scale the PDF/media page store is far beyond the
    # broadcast threshold; the payload join must degrade to a shuffle
    # join (sort-merge / shuffled-hash), NOT a forced broadcast that
    # would OOM the driver at 100×. Simulate "store too big" by
    # disabling auto-broadcast and assert no broadcast join survives
    # anywhere in the extraction DAG (i.e. no broadcast() hint pins the
    # store side).
    from oar_ocr_spark.functions.multimodal import png_store_df

    docs_raw = generate_documents(8, seed=21)
    docs = _parquet_docs(spark, tmp_path, docs_raw)
    refs = docs.select(
        F.explode(
            F.expr(
                "transform(filter(spans, s -> s.kind = 'media' and s.media_ref"
                " is not null), s -> s.media_ref)"
            )
        ).alias("media_ref")
    ).distinct()
    store = png_store_df(refs)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = extract_spans(spark, docs, media_store=store, persist_input=False)
        plan = _plan(out)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan
    # and the shuffle join is correct: results equal the renderer path
    a = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in out.collect()}
    b = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in extract_spans(spark, docs, persist_input=False).collect()
    }
    assert a == b


def test_heavy_doc_crops_spread_across_partitions(spark):
    # the crop repartition on (doc_id, offset, det_idx) must fan a
    # heavy document's pages across partitions (built-in salting) —
    # one task never owns more than its hash share
    all_docs = generate_documents(120, seed=11)
    heavy = [d for d in all_docs if len(d["spans"]) >= 100]
    assert heavy, "corpus should contain a heavy doc"
    docs = heavy[:1] + [d for d in all_docs if len(d["spans"]) < 100][:10]
    rows = [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in docs]
    df = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    cfg = ExtractConfig()
    flat = df.select("doc_id", F.explode_outer("spans").alias("s"))
    crops = detect_crops_from_flat(flat, cfg).repartition(8, "doc_id", "offset", "det_idx")
    dist = (
        crops.where(F.col("doc_id") == heavy[0]["doc_id"])
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = {r["pid"]: r["count"] for r in dist}
    total = sum(counts.values())
    assert len(counts) >= 6, counts  # spread over most of the 8 partitions
    assert max(counts.values()) / total < 0.4, counts  # no single-task hotspot


def test_overlap_join_probe_side_is_spread(spark, tmp_path):
    # the spatial theta-join broadcasts the small dim side (the right
    # 100 TB shape), but its probe side arrives as a single parquet
    # file = one partition — at sf1 that serialized 2G pair
    # evaluations onto one task. The REPARTITION hint must survive
    # into the physical plan so the codegen'd pair loop parallelizes.
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em

    df = em.queries()["overlap_join"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "RoundRobinPartitioning(32)" in plan, plan
    assert "CartesianProduct" not in plan


def test_decontaminate_broadcasts_the_benchmark_side(spark, tmp_path):
    # BENCH claim: the benchmark gram set broadcasts (it is small by
    # nature), so the corpus side joins map-side without a shuffle
    from oar_ocr_spark.functions.dedup import decontaminate_df

    rows = [(str(i), " ".join(f"w{i}x{j}" for j in range(20)))
            for i in range(50)]
    path = str(tmp_path / "docs_flat.parquet")
    spark.createDataFrame(rows, "doc_id string, text string").write.mode(
        "overwrite"
    ).parquet(path)
    df = spark.read.parquet(path)
    plan = _plan(decontaminate_df(df, bench_mod=23, k=8))
    assert "BroadcastHashJoin" in plan, plan
    # the count aggregation is map-side combinable
    assert "partial_count" in plan, plan
