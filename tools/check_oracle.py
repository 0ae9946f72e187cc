"""Local replica of the driver's correctness gate: run every
oracle_queries entry on Spark and DuckDB at a given sf and compare
row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

from go_scrapper_spark import oracle_queries as oq
from go_scrapper_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def compare(name, spark_df, duck_rows, duck_cols):
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        return f"SCHEMA MISMATCH spark={s_cols} duck={d_cols}"
    s_rows = spark_df.collect()
    if len(s_rows) != len(duck_rows):
        return f"ROWCOUNT spark={len(s_rows)} duck={len(duck_rows)}"
    sidx = [spark_df.columns.index(c) for c in s_cols]
    didx = [list(duck_cols).index(c) for c in d_cols]
    s_vals = sorted(tuple(norm_cell(r[i]) for i in sidx) for r in s_rows)
    d_vals = sorted(tuple(norm_cell(r[i]) for i in didx) for r in duck_rows)
    if s_vals != d_vals:
        for a, b in zip(s_vals, d_vals):
            if a != b:
                return f"VALUE MISMATCH first-diff spark={a!r} duck={b!r}"
        return "VALUE MISMATCH"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failed = []
    for name, (fn, sql) in oq.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            rel = con.sql(sql)
            err = compare(name, sdf, rel.fetchall(), rel.columns)
        except Exception as e:  # noqa: BLE001
            err = f"EXCEPTION {type(e).__name__}: {e}"
        dt = time.time() - t0
        status = "OK " if err is None else "FAIL"
        print(f"{status} {name:24s} {dt:6.1f}s {err or ''}"[:300], flush=True)
        if err:
            failed.append(name)
    for name, fn in oq.NO_ORACLE.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            print(f"OK  {name:24s} {time.time()-t0:6.1f}s rows-only n={n}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name:24s} EXCEPTION {e}"[:300], flush=True)
            failed.append(name)
    print("FAILED:", failed if failed else "none")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
