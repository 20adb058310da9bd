"""Similarity search over an embedding column (array<float>).

- cosine(): JVM-side column expression (zip_with + aggregate in double
  precision) — no Python in the hot path.
- knn_bruteforce(): exact top-k by cosine for a set of query vectors;
  the baseline. Query side is broadcast (small), so the scan side
  streams once with no shuffle.
- lsh_ann(): random-hyperplane LSH — sign-bit bucket per vector
  (vectorized pandas UDF; hyperplanes derived from a fixed seed), then
  candidates restricted to same-bucket (or near-bucket) vectors: the
  scale path, turning O(N·Q) into O(N·Q/2^bits) with an equi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["cosine", "knn_bruteforce", "lsh_bucket_df", "lsh_ann"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float> columns (double math)."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def knn_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: query_id, neighbor_id, cosine (4dp), rank.

    The scale shape: queries are collected to a (Q, dim) matrix and
    broadcast; each partition computes one vectorized matmul against
    its embedding block and emits only its local top-k per query
    (Arrow-batched pandas UDF — the interpreted per-pair HOF dot
    product was ~50× slower); the global top-k merge is a tiny
    groupBy over Q·k·partitions rows. Ranking ties break on rounded
    similarity then neighbor_id for determinism.
    """
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    qrows = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).collect()
    if not qrows:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    q_ids = np.asarray([r["query_id"] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sc = embeddings.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, Qn))

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def it(batches):
        q_ids_b, Qn_b = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy()
            M = np.stack(pdf["ev"].to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = Mn @ Qn_b.T  # (B, Q)
            out_q, out_n, out_c = [], [], []
            top = min(len(ids), k + 1)  # +1 covers the self-match drop
            for qi in range(len(q_ids_b)):
                col = sims[:, qi]
                part = np.argpartition(-col, top - 1)[:top] if top < len(ids) else np.arange(len(ids))
                for j in part:
                    if ids[j] == q_ids_b[qi]:
                        continue
                    out_q.append(q_ids_b[qi])
                    out_n.append(ids[j])
                    out_c.append(float(col[j]))
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cos": out_c})

    local = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ev")
    ).mapInPandas(it, schema=schema)
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_bits, dim)).astype(np.float64)


def lsh_bucket_df(
    df: DataFrame,
    dim: int,
    n_bits: int = 8,
    seed: int = 13,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector its sign-bit LSH bucket in each of `n_tables`
    hash tables (multi-table LSH: candidate recall grows with L while
    each join stays selective). Vectorized pandas UDF: one matmul per
    Arrow batch against the broadcast hyperplanes.
    Output: (vec_id, table_id, bucket) — one row per table."""
    planes = np.stack(
        [_hyperplanes(dim, n_bits, seed + 1000 * t) for t in range(n_tables)]
    )  # (L, n_bits, dim)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("table_id", T.IntegerType()),
            T.StructField("bucket", T.IntegerType()),
        ]
    )
    weights = 1 << np.arange(n_bits)

    def it(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # (B, dim)
            ids = pdf[id_col].to_numpy()
            frames = []
            for t in range(n_tables):
                bits = (M @ planes[t].T) > 0  # (B, n_bits)
                bucket = (bits * weights).sum(axis=1).astype(np.int32)
                frames.append(
                    pd.DataFrame(
                        {"vec_id": ids, "table_id": np.int32(t), "bucket": bucket}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return df.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(it, schema=schema)


def lsh_ann(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 6,
    seed: int = 13,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = same bucket in ANY of n_tables
    LSH tables (union via distinct on the (table_id, bucket) equi-join),
    ranked by exact cosine. Output schema matches knn_bruteforce
    (recall measured in tests against it)."""
    from pyspark.sql import Window

    eb = lsh_bucket_df(
        embeddings, dim, n_bits, seed, n_tables, id_col, vec_col
    ).withColumnRenamed("vec_id", "neighbor_id")
    qb = lsh_bucket_df(
        queries, dim, n_bits, seed, n_tables, id_col, vec_col
    ).withColumnRenamed("vec_id", "query_id")
    cand = (
        eb.join(F.broadcast(qb), ["table_id", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    e = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ev"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    pairs = cand.join(e, "neighbor_id").join(F.broadcast(q), "query_id")
    sim = pairs.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("ev")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("neighbor_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
