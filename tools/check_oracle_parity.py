"""Simulate the driver's correctness gate locally.

Runs every __spark_entry__ queries() entry and its oracle_sql() twin on
the same sf dir, comparing row count, column names, and an
order-insensitive value hash.

The hash is COMMUTATIVE and STREAMED so the tool is memory-bounded at
any scale: each row is canonicalized (columns sorted by name, floats
rounded to 6dp, -0.0 folded to 0.0, timestamps/NaT stringified, None/NaN
-> NULL), hashed with pandas' deterministic siphash, and summed mod
2**64.  The Spark side writes the result to a temp parquet dir (a
distributed write — the driver JVM never collects) and the tool scans it
in record batches; the DuckDB side streams record batches directly.
sf1's overlap_join (90.7M result rows) OOM'd the old toPandas-based
compare; this path handles it in constant memory.

Usage: python tools/check_oracle_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_ROWS = 1 << 18
MASK64 = (1 << 64) - 1


def _canonical_rows(pdf):
    """Canonicalize a pandas batch to one string Series per row."""
    import numpy as np
    import pandas as pd

    cols = []
    for c in sorted(pdf.columns):
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            v = np.round(s.to_numpy(dtype="float64"), 6) + 0.0  # fold -0.0
            cs = pd.Series(v, index=s.index).astype(str)
            nan_mask = np.isnan(v)
            if nan_mask.any():
                cs[nan_mask] = "NULL"
        elif pd.api.types.is_datetime64_any_dtype(s):
            cs = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            cs = s.map(
                lambda v: "NULL"
                if v is None or (isinstance(v, float) and v != v)
                else str(v)
            )
        else:
            cs = s.astype(str)
        cols.append(cs)
    if not cols:
        import pandas as pd

        return pd.Series([], dtype=str)
    return cols[0].str.cat(cols[1:], sep="|") if len(cols) > 1 else cols[0]


def _hash_batches(batches):
    """(commutative hash, row count) over an iterable of pandas frames."""
    import numpy as np
    import pandas as pd

    total, n = 0, 0
    for pdf in batches:
        if len(pdf) == 0:
            continue
        rows = _canonical_rows(pdf)
        h = pd.util.hash_pandas_object(rows, index=False).to_numpy(dtype="uint64")
        total = (total + int(h.sum(dtype=np.uint64))) & MASK64
        n += len(pdf)
    return total, n


def _spark_batches(df, tmp_root):
    """Stream a Spark DataFrame via a distributed parquet write."""
    import pyarrow.dataset as ds

    out = tempfile.mkdtemp(dir=tmp_root)
    try:
        df.write.mode("overwrite").parquet(out)
        dataset = ds.dataset(out)
        for b in dataset.to_batches(batch_size=BATCH_ROWS):
            yield b.to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _duck_batches(con, sql):
    reader = con.sql(sql).fetch_arrow_reader(BATCH_ROWS)
    while True:
        try:
            yield reader.read_next_batch().to_pandas()
        except StopIteration:
            return


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle_parity")
        # local mode = ONE JVM for driver + executors; the 1g default
        # heap OOMs the sf1 aggregations (8 tasks × 128 MB), so size it
        # like a real executor (2g/task) — the gate semantics are
        # config-independent (order-insensitive streamed hash)
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp_root = tempfile.mkdtemp(prefix="parity_")

    con = duckdb.connect()
    for t in entry_mod.TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    try:
        for name, fn in qs.items():
            if only and name not in only:
                continue
            t0 = time.time()
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                print(f"  {name:24s} rows={n:7d}  spark={time.time() - t0:5.1f}s  (rows-only)")
                if n == 0 and name != "extraction_e2e":
                    failures.append((name, "rows-only query returned 0 rows"))
                continue
            s_cols = sorted(sdf.columns)
            h_s, n_s = _hash_batches(_spark_batches(sdf, tmp_root))
            t_spark = time.time() - t0
            o_rel = con.sql(oracles[name])
            o_cols = sorted(o_rel.columns)
            h_o, n_o = _hash_batches(_duck_batches(con, oracles[name]))
            cols_match = s_cols == o_cols
            status = "OK " if (h_s == h_o and n_s == n_o and cols_match) else "FAIL"
            print(
                f"  {name:24s} rows={n_s:7d}/{n_o:<7d} cols={'=' if cols_match else '!'} "
                f"hash={'=' if h_s == h_o else '!'} spark={t_spark:5.1f}s  {status}"
            )
            if status != "OK ":
                failures.append((name, f"rows {n_s} vs {n_o}, cols {s_cols} vs {o_cols}"))
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)
        spark.stop()
    if failures:
        print("FAILURES:")
        for n, msg in failures:
            print(" ", n, msg)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
