"""Simulate the driver's correctness gate locally.

Runs every __spark_entry__ queries() entry and its oracle_sql() twin on
the same sf dir, comparing row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted,
floats rounded to 6dp, timestamps normalized to ISO strings).

Usage: python tools/check_oracle_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(df_pandas):
    import numpy as np
    import pandas as pd

    df = df_pandas.copy()
    df = df[sorted(df.columns)]
    out_rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{round(v, 6):.6f}")
            elif isinstance(v, pd.Timestamp):
                vals.append(v.isoformat())
            else:
                vals.append(str(v))
        out_rows.append("|".join(vals))
    out_rows.sort()
    return hashlib.md5("\n".join(out_rows).encode()).hexdigest(), len(out_rows)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle_parity")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in entry_mod.TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:24s} rows={len(sdf):7d}  spark={t_spark:5.1f}s  (rows-only)")
            if len(sdf) == 0 and name != "extraction_e2e":
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        odf = con.sql(oracles[name]).df()
        h_s, n_s = normalize(sdf)
        h_o, n_o = normalize(odf)
        cols_match = sorted(sdf.columns) == sorted(odf.columns)
        status = "OK " if (h_s == h_o and cols_match) else "FAIL"
        print(
            f"  {name:24s} rows={n_s:7d}/{n_o:<7d} cols={'=' if cols_match else '!'} "
            f"hash={'=' if h_s == h_o else '!'} spark={t_spark:5.1f}s  {status}"
        )
        if status != "OK ":
            failures.append((name, f"rows {n_s} vs {n_o}, cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
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
