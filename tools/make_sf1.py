"""Materialize a deterministic sf1-scale corpus from the driver's sf0.1 tables.

The driver only ships sf{0.001,0.01,0.1}; scale-dependent regressions
(broadcast thresholds, AQE decisions, skew, caps that fail loudly) surface a
decade earlier with an sf1 corpus.  This tool synthesises one WITHOUT any
external data: it replicates /root/testdata/sf0.1 exactly 10x with key
remapping, preserving every invariant the queries rely on:

- referential integrity: every foreign key is offset by the same per-replica
  stride as its parent's primary key (dense 0..N-1 keys at sf0.1, so the
  stride is simply the parent row count);
- schema identity: pyarrow column arithmetic + cast back to the source type
  (int32 stays int32, timestamp[us] untouched);
- documents: text replicated verbatim (10x exact duplicates is a realistic
  and useful dedup stress; n_chars == len(text) invariant holds trivially);
- embeddings: replicas i>0 are perturbed by deterministic N(0, 1e-3) noise
  and re-normalised to unit length.  Exact-duplicate vectors would create
  massive cosine-distance ties, and top-k tie-breaking is the one place
  Spark and DuckDB may legitimately diverge — tiny noise removes the tie
  class entirely while keeping 10 near-identical neighbourhoods per vector
  (a realistic near-dup stress).

region/nation keep their fixed TPC-H cardinality (5/25), as at every sf.

Usage: python tools/make_sf1.py [out_dir]    (default .localdata/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# table -> {column: stride} (stride = parent table's sf0.1 row count)
STRIDES = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
COPY_AS_IS = ["region", "nation"]


def _offset_table(t: pa.Table, strides: dict[str, int], i: int) -> pa.Table:
    for col, stride in strides.items():
        idx = t.schema.get_field_index(col)
        src = t.column(idx)
        shifted = pc.add(src, pa.scalar(i * stride, type=pa.int64()))
        t = t.set_column(idx, t.schema.field(idx), shifted.cast(t.schema.field(idx).type))
    return t


def _perturb_embeddings(t: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return t
    idx = t.schema.get_field_index("embedding")
    col = t.column(idx).combine_chunks()
    arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0])
    mat = flat.reshape(-1, dim)
    rng = np.random.default_rng(1_000_003 + i)
    mat = mat + rng.normal(0.0, 1e-3, size=mat.shape)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    new = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.astype(np.float32).ravel(), type=pa.float32()), dim
    ).cast(t.schema.field(idx).type)
    return t.set_column(idx, t.schema.field(idx), new)


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1"
    )
    os.makedirs(out_dir, exist_ok=True)

    for name in COPY_AS_IS:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{out_dir}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (copied)")

    for name, strides in STRIDES.items():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(REPLICAS):
            rep = _offset_table(src, strides, i)
            if name == "embeddings":
                rep = _perturb_embeddings(rep, i)
            parts.append(rep)
        t = pa.concat_tables(parts)
        pq.write_table(t, f"{out_dir}/{name}.parquet")
        assert t.schema.equals(src.schema), f"schema drift in {name}"
        print(f"{name}: {src.num_rows} -> {t.num_rows} rows")
    print(f"sf1 corpus at {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
