"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, schema
width, and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified with float rounding).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    def cell(v):
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)
    rows = sorted(
        "|".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from wss_spark import catalog
    from wss_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    results = {}
    for name, q in catalog.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:
            results[name] = f"SPARK-ERROR {type(e).__name__}: {str(e)[:200]}"
            print(f"{name:32s} {results[name]}")
            continue
        if q.sql is None:
            results[name] = f"rows-only n={len(sdf)}"
            print(f"{name:32s} rows-only       n={len(sdf):<7d} {time.time()-t0:5.1f}s")
            continue
        try:
            odf = con.execute(q.sql).df()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {type(e).__name__}: {str(e)[:200]}"
            print(f"{name:32s} {results[name]}")
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = value_hash(sdf) == value_hash(odf) if ok_rows and ok_cols else False
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        results[name] = status
        print(
            f"{name:32s} {status:15s} n={len(sdf)}/{len(odf)} cols={ok_cols} "
            f"hash={ok_hash} {time.time()-t0:5.1f}s"
        )
        if status != "OK":
            print("  spark cols:", list(sdf.columns), sdf.dtypes.tolist())
            print("  duck  cols:", list(odf.columns), odf.dtypes.tolist())

    bad = [k for k, v in results.items() if v not in ("OK",) and not v.startswith("rows-only")]
    print(f"\n{len(results) - len(bad)}/{len(results)} clean; failing: {bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
