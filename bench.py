"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and
prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "docs_per_sec": ..., "n_docs": ...}

`value` = wall seconds of the flagship end-to-end extraction
(the north metric documents/sec is reported as docs_per_sec).

--scaling additionally reruns the extraction at N/4 cores in a fresh
session and reports throughput-scaling efficiency
(T_smallN vs T_bigN; efficiency = (thr_big / thr_small) / 4), the
BASELINE.md protocol (one warm-up run excluded).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"oar_ocr_spark_bench_{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.worker.reuse", "true")
        .getOrCreate()
    )


def _warm_workers(spark, cores: int) -> None:
    """Fork one python worker per slot and pre-import the engine so the
    measured runs see steady-state workers."""

    def warm_iter(batches):
        import oar_ocr_spark.pipeline  # noqa: F401  (pulls numpy/pandas/operators)

        yield from batches

    spark.range(0, cores * 100, 1, cores).mapInPandas(warm_iter, "id long").count()


def run_extraction(spark, sf_dir: str) -> tuple[float, int, int]:
    """Full extraction over the derived interleaved corpus.
    Returns (seconds, n_docs, n_spans_out)."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F
    from oar_ocr_spark.pipeline import extract_spans

    E._register_views(spark, sf_dir)
    docs = E.interleaved_docs_df(spark)
    n_docs = docs.count()
    t0 = time.time()
    out = extract_spans(spark, docs)
    n_spans = out.select(F.sum(F.size("spans"))).collect()[0][0]
    secs = time.time() - t0
    return secs, n_docs, int(n_spans or 0)


def main() -> None:
    scaling = "--scaling" in sys.argv
    import __spark_entry__ as E

    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (excluded, mirrors reference benchmarking guidance
    # docs/FAQ.md:30): fork + import-warm EVERY python worker slot —
    # a limit() warm-up coalesces to one partition and leaves the other
    # slots to pay their cold start inside the measured run
    from oar_ocr_spark.pipeline import extract_spans

    _warm_workers(spark, CPUS)
    E._register_views(spark, SF_DIR)
    extract_spans(spark, E.interleaved_docs_df(spark).limit(24)).count()

    queries: dict[str, float] = {}

    t_ex, n_docs, n_spans = run_extraction(spark, SF_DIR)
    queries["extraction_e2e"] = round(t_ex, 3)

    qs = E.queries()
    for name in [
        "tpch_q1_pricing",
        "tpch_q3_revenue_topk",
        "reading_order_keys",
        "overlap_join",
        "events_hourly",
        "dedup_exact",
        "minhash_bands",
        "ngram_jaccard",
        "simhash",
        "token_stats",
        "quality_score",
        "lang_id",
        "knn_bruteforce",
        "lsh_ann",
    ]:
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        queries[name] = round(time.time() - t0, 3)

    result = {
        "metric": "end-to-end span extraction + analytics suite wall time",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "n_docs": n_docs,
        "n_spans_out": n_spans,
        "docs_per_sec": round(n_docs / t_ex, 2),
        "cpus": CPUS,
    }

    if scaling:
        spark.stop()
        small = max(CPUS // 4, 1)
        spark2 = make_spark(small)
        spark2.sparkContext.setLogLevel("ERROR")
        _warm_workers(spark2, small)
        E._register_views(spark2, SF_DIR)
        extract_spans(spark2, E.interleaved_docs_df(spark2).limit(24)).count()  # warm-up
        t_small, n_docs2, _ = run_extraction(spark2, SF_DIR)
        spark2.stop()
        thr_small = n_docs2 / t_small
        thr_big = n_docs / t_ex
        result["scaling"] = {
            "cores_small": small,
            "cores_big": CPUS,
            "docs_per_sec_small": round(thr_small, 2),
            "docs_per_sec_big": round(thr_big, 2),
            "efficiency": round((thr_big / thr_small) / (CPUS / small), 3),
        }
    else:
        spark.stop()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
