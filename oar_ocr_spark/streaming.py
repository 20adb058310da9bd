"""Structured Streaming surface for the extraction DAG.

The reference is strictly batch (SURVEY.md §2.9) and the north_rule is
batch-over-snapshots, so streaming is not load-bearing — but the stage
DAG ports directly to `foreachBatch`, and this module proves it: a
file/Iceberg stream of documents(doc_id, spans) is extracted
micro-batch by micro-batch with exactly the same `extract_spans` plan.
foreachBatch is an at-least-once contract (a micro-batch can be
retried after a partial write), so the sink write is made IDEMPOTENT:
each batch overwrites its own batch_id=<id> partition directory — a
retry replaces, never duplicates — which combined with the source's
checkpointed offsets gives effectively-once results.

At corpus scale this is the "continuously arriving crawl shards" mode:
each micro-batch is one snapshot delta; lineage/metrics integration is
the same as the batch path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .local_ref import ExtractConfig
from .pipeline import extract_spans
from .schemas import DOCUMENTS_SCHEMA

__all__ = ["extract_stream"]


def extract_stream(
    spark: SparkSession,
    input_path: str,
    results_path: str,
    checkpoint_path: str,
    cfg: ExtractConfig | None = None,
    trigger_once: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """readStream(documents parquet dir) → extract_spans per micro-batch
    → append parquet. Returns the started StreamingQuery.

    trigger_once=True processes the currently-available input and
    stops (the snapshot-delta mode); set False with
    max_files_per_trigger for a continuous tail."""
    cfg = cfg or ExtractConfig()
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = extract_spans(
            batch_df.sparkSession, batch_df, cfg, persist_input=True
        )
        # idempotent by batch_id: a retried micro-batch overwrites its
        # own partition instead of appending duplicate rows
        out.write.mode("overwrite").parquet(
            os.path.join(results_path, f"batch_id={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
