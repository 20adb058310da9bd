"""Lineage, stage metrics, and checkpoint/resume.

north_rule obligations: per-partition lineage rows + stage metrics
written alongside results, and a failed run must resume from a
checkpoint without reprocessing completed ranges.

Design (SURVEY.md §2.9/§4):
- The corpus is processed in `n_buckets` hash ranges of doc_id
  (bucket = pmod(xxhash64(doc_id), n_buckets)) — the Iceberg-snapshot
  analog of a hash-range watermark table. Each bucket commits
  atomically: results append (parquet dir per bucket) + a lineage row
  (stage='bucket_complete') written only after the append succeeds.
- resume = anti-join of buckets against completed lineage rows: a
  rerun skips committed buckets and reprocesses only the rest.
- stage metrics: every detect/recognize task appends one JSON line per
  Arrow partition (partition_id from TaskContext, rows_in/rows_out,
  elapsed ms) into lineage_dir/stage_metrics/ — task-side lineage logs
  on the shared store (an executor-visible path on a real cluster).

On a real deployment the parquet dirs become an Iceberg table and the
lineage dir a second table; the control flow is identical.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .local_ref import ExtractConfig
from .pipeline import extract_spans

__all__ = ["run_extraction_job", "read_lineage", "read_stage_metrics", "instrument_map_in_pandas"]


def instrument_map_in_pandas(fn, stage: str, metrics_dir: str | None):
    """Wrap a mapInPandas iterator-fn to append one metrics line per
    task into metrics_dir (no-op when metrics_dir is None)."""
    if metrics_dir is None:
        return fn

    def wrapped(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        t0 = time.time()
        rows_in = 0
        rows_out = 0
        for pdf in batches:
            rows_in += len(pdf)
            for out in fn(iter([pdf])):
                rows_out += len(out)
                yield out
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        os.makedirs(metrics_dir, exist_ok=True)
        rec = {
            "stage": stage,
            "partition_id": pid,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "elapsed_ms": round((time.time() - t0) * 1000, 3),
        }
        path = os.path.join(metrics_dir, f"{stage}-{pid}-{uuid.uuid4().hex[:8]}.json")
        with open(path, "w") as f:
            f.write(json.dumps(rec) + "\n")

    return wrapped


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")


def _completed_buckets(lineage_path: str) -> set[int]:
    done: set[int] = set()
    if not os.path.isdir(lineage_path):
        return done
    for name in os.listdir(lineage_path):
        if name.startswith("bucket_complete-"):
            with open(os.path.join(lineage_path, name)) as f:
                for line in f:
                    rec = json.loads(line)
                    done.add(int(rec["bucket"]))
    return done


def run_extraction_job(
    spark: SparkSession,
    docs: DataFrame,
    results_path: str,
    lineage_path: str,
    cfg: ExtractConfig | None = None,
    n_buckets: int = 8,
    fail_after_bucket: int | None = None,
) -> dict:
    """Extract `docs` bucket-by-bucket with per-bucket commit + resume.

    Returns a summary dict. `fail_after_bucket` injects a failure after
    committing that many buckets (test hook for the resume path).
    """
    cfg = cfg or ExtractConfig()
    os.makedirs(lineage_path, exist_ok=True)
    done = _completed_buckets(lineage_path)
    docs_b = docs.withColumn("_bucket", _bucket_col(n_buckets))
    processed = 0
    skipped = 0
    for b in range(n_buckets):
        if b in done:
            skipped += 1
            continue
        subset = docs_b.where(F.col("_bucket") == b).drop("_bucket")
        t0 = time.time()
        out = extract_spans(spark, subset, cfg)
        bucket_dir = os.path.join(results_path, f"bucket={b}")
        out.write.mode("overwrite").parquet(bucket_dir)
        # count what landed on disk — re-counting `out` would re-execute
        # the whole extraction DAG (detect+recognize UDFs) a second time
        n_docs = spark.read.parquet(bucket_dir).count()
        # commit: the lineage row is written only after the results land
        rec = {
            "stage": "bucket_complete",
            "bucket": b,
            "n_docs": n_docs,
            "elapsed_ms": round((time.time() - t0) * 1000, 3),
        }
        with open(os.path.join(lineage_path, f"bucket_complete-{b}.json"), "w") as f:
            f.write(json.dumps(rec) + "\n")
        processed += 1
        if fail_after_bucket is not None and processed >= fail_after_bucket:
            raise RuntimeError(f"injected failure after {processed} buckets")
    return {"processed_buckets": processed, "skipped_buckets": skipped, "n_buckets": n_buckets}


def read_lineage(spark: SparkSession, lineage_path: str) -> DataFrame:
    """Completed-bucket lineage rows as a DataFrame."""
    rows = []
    for name in sorted(os.listdir(lineage_path)):
        if name.startswith("bucket_complete-"):
            with open(os.path.join(lineage_path, name)) as f:
                rows.extend(json.loads(line) for line in f)
    return spark.createDataFrame(
        [(r["stage"], int(r["bucket"]), int(r["n_docs"]), float(r["elapsed_ms"])) for r in rows],
        "stage string, bucket int, n_docs long, elapsed_ms double",
    )


def read_stage_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame:
    """Task-side stage metrics as a DataFrame (LINEAGE_SCHEMA shape)."""
    rows = []
    if os.path.isdir(metrics_dir):
        for name in sorted(os.listdir(metrics_dir)):
            with open(os.path.join(metrics_dir, name)) as f:
                rows.extend(json.loads(line) for line in f)
    return spark.createDataFrame(
        [
            (r["stage"], int(r["partition_id"]), int(r["rows_in"]), int(r["rows_out"]), float(r["elapsed_ms"]))
            for r in rows
        ],
        "stage string, partition_id int, rows_in long, rows_out long, elapsed_ms double",
    )
