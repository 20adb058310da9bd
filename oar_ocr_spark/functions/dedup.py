"""Deduplication at corpus scale: exact, MinHash+LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-dup.

Scale design notes:
- exact_dedup: one hash-groupBy (map-side partial agg; no Python).
- shingles/minhash: shingling via slice/transform HOFs (no explode of
  tokens through a shuffle); signatures are md5-string minima so the
  whole signature is computed in one groupBy-free select; LSH banding
  turns near-dup search into an equi-join on (band_id, band_hash) —
  the only shuffle, and it is keyed by short hashes (skew-free).
- ngram_jaccard_pairs: exact pairwise Jaccard via a shared-shingle
  equi-join + count ratios; quadratic only within shingle buckets.
- simhash: 64-bit signature packed in a vectorized pandas UDF (bit ops
  aren't expressible as Catalyst columns); Hamming-distance candidate
  pairs via band equi-join on 16-bit chunks.
- embedding near-dup: cosine over float arrays with zip_with/aggregate
  (JVM), self-join pruned by an LSH bucket (similarity.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "exact_dedup",
    "shingle_df",
    "minhash_band_hashes",
    "minhash_candidates",
    "ngram_jaccard_pairs",
    "simhash_df",
    "simhash_candidates",
]


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Group by content hash; keep min(doc_id) as representative.
    Output: fingerprint, keep_doc_id, n_dups."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return (
        df.select(F.col("doc_id").cast("string").alias("doc_id"), F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
    )


def shingle_df(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, sh): distinct word k-shingles via array HOFs (no token
    explode shuffle — shingling happens inside the row)."""
    toks = F.split(F.col(text_col), " ")
    # indices 0..size-k (short docs degrade to one whole-text shingle)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(F.array_distinct(sh)).alias("sh"),
    )


def minhash_band_hashes(
    df: DataFrame, text_col: str = "text", n_hashes: int = 8, n_bands: int = 2, k: int = 3
) -> DataFrame:
    """MinHash signature + LSH band hashes.

    h_i(shingle) = md5(i || '#' || shingle); the per-doc minimum of the
    hex strings is a valid min-hash (lexicographic order on a uniform
    hash family). Band hash = md5 of the band's mins joined in seed
    order. Output: doc_id, band_id, band_hash.
    """
    rows_per_band = n_hashes // n_bands
    sh = shingle_df(df, text_col, k)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    hashed = sh.select("doc_id", "sh", seeds).select(
        "doc_id",
        "seed",
        F.md5(F.concat(F.col("seed").cast("string"), F.lit("#"), F.col("sh"))).alias("h"),
    )
    sig = hashed.groupBy("doc_id", "seed").agg(F.min("h").alias("mh"))
    return (
        sig.withColumn("band_id", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                        lambda s: s["mh"],
                    ),
                    "|",
                )
            ).alias("band_hash")
        )
    )


def minhash_candidates(band_hashes: DataFrame) -> DataFrame:
    """LSH candidate pairs: docs sharing any band hash.
    Output: doc_a < doc_b, n_shared_bands."""
    a = band_hashes.alias("a")
    b = band_hashes.alias("b")
    return (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_bands"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.
    Output: doc_a < doc_b, jaccard (rounded 4dp), filtered ≥ threshold."""
    sh = shingle_df(df, text_col, k).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 4).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def _simhash_batch(doc_ids: pd.Series, texts: pd.Series) -> pd.DataFrame:
    """Vectorized 64-bit SimHash: per token md5 → 64 bits, weighted
    majority vote per bit position."""
    import hashlib

    out = np.zeros(len(texts), dtype=np.int64)
    for row_i, text in enumerate(texts):
        toks = (text or "").split(" ")
        if not toks:
            continue
        bits = np.zeros((len(toks), 64), dtype=np.int8)
        for ti, tok in enumerate(toks):
            h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
            bits[ti] = [(h >> b) & 1 for b in range(64)]
        vote = bits.sum(axis=0) * 2 - len(toks)  # >0 → bit set
        sh = 0
        for b in range(64):
            if vote[b] > 0:
                sh |= 1 << b
        # two's-complement into int64
        out[row_i] = np.int64(np.uint64(sh).astype(np.int64))
    return pd.DataFrame({"doc_id": doc_ids.astype(str), "simhash": out})


def simhash_df(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, simhash (int64) via an Arrow-batched pandas UDF (mapInPandas)."""

    def it(batches):
        for pdf in batches:
            yield _simhash_batch(pdf["doc_id"], pdf[text_col])

    return df.select(F.col("doc_id").cast("string").alias("doc_id"), text_col).mapInPandas(
        it, schema=_SIMHASH_SCHEMA
    )


def simhash_candidates(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates by banded SimHash (4×16-bit chunks → by
    pigeonhole any pair with hamming ≤ 3 shares a chunk) verified with
    an exact popcount. Output: doc_a, doc_b, hamming."""
    chunks = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk_id", "c.chunk")
    pairs = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["chunk_id", "chunk"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return pairs.select("doc_a", "doc_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
