"""Partition-spreading helpers for UDF stages.

Why this exists (measured, round 6): ``df.repartition(n, "k")`` is
silently REMOVED by EnsureRequirements when its input already arrives
hash-partitioned on the same key with the same partition count — which
is exactly what happens right after a ``groupBy("k")`` at
``spark.sql.shuffle.partitions == n``. The surviving upstream exchange
has ENSURE_REQUIREMENTS origin, so AQE partition coalescing is free to
shrink it — to ONE partition for kilobyte-scale aggregates — and every
downstream per-row codec UDF then runs serially on one task (the
pdf/tiff store stages measured at single-thread wall despite
parallelism=32).

``spread`` hash-partitions on an xxhash64 EXPRESSION of the keys
instead: the exchange no longer matches the upstream partitioning (so
it survives planning) and carries REPARTITION_BY_NUM origin (so AQE
never coalesces it). Assignment stays a deterministic function of the
key columns — no rand(), so task retries are safe (SPARK-38388) — and
results are unchanged because every consumer is partition-invariant by
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["spread"]


def spread(df: DataFrame, n: int, *cols: str) -> DataFrame:
    """Deterministic hash repartition into exactly ``n`` partitions that
    neither EnsureRequirements nor AQE coalescing can remove."""
    if not cols:
        return df.repartition(n)
    return df.repartition(n, F.xxhash64(*[F.col(c) for c in cols]))
