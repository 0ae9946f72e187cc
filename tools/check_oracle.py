"""Local replica of the driver's correctness gate: run every
oracle_queries entry on Spark and DuckDB at a given sf and compare
row count + column names + order-insensitive values.

The DuckDB side is materialized through pandas (``rel.df()``) exactly
like the driver's value-hash path, so type-degradation bugs surface
here too: DuckDB ``sum(BIGINT)`` returns HUGEINT, which pandas turns
into float64 — a float64 column hashing against Spark's int64 is the
round-1 a1/j4/a4 failure mode. Cells are normalized with their type
class attached (int vs float vs str), so an int/float dtype mismatch
is a FAIL even when the numeric values coincide.

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
    """Normalize a cell to (type_class, value) so int64 vs float64
    disagreements (the HUGEINT->float64 degradation) are mismatches."""
    import numpy as np

    if v is None or (isinstance(v, float) and v != v):  # NaN -> null
        return ("null", None)
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("int", int(v))
    if isinstance(v, (float, np.floating)):
        return ("float", round(float(v), 9))
    if isinstance(v, bytes):
        return ("bytes", v.hex())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("list", tuple(norm_cell(x) for x in v))
    if hasattr(v, "isoformat"):  # datetime/date/Timestamp
        return ("ts", v.isoformat())
    return ("str", str(v))


def assert_scalar_schema(spark_df):
    """The driver's oracle harness canonicalizes result frames with
    pandas ``sort_values`` over ALL columns, which factorizes cells —
    any array/map/struct-typed output column crashes it with
    "unhashable type: 'list'" (round-2's mm_audio_features red). Ban
    complex types here so local green predicts driver green: explode
    arrays to one scalar row per element instead."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if bad:
        raise TypeError(
            f"complex-typed output columns {bad} would crash the driver's "
            "hash harness (pandas sort_values factorize); explode to scalar rows"
        )


def compare(name, spark_df, duck_pdf):
    assert_scalar_schema(spark_df)
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return f"SCHEMA MISMATCH spark={s_cols} duck={d_cols}"
    s_rows = spark_df.collect()
    if len(s_rows) != len(duck_pdf):
        return f"ROWCOUNT spark={len(s_rows)} duck={len(duck_pdf)}"
    sidx = [spark_df.columns.index(c) for c in s_cols]
    s_vals = sorted(tuple(norm_cell(r[i]) for i in sidx) for r in s_rows)
    d_recs = duck_pdf[d_cols].itertuples(index=False, name=None)
    d_vals = sorted(tuple(norm_cell(v) for v in rec) for rec in d_recs)
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
            err = compare(name, sdf, con.sql(sql).df())
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
