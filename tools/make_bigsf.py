"""Generate a 10x measurement-only scale of /root/testdata/sf0.1 into
/dev/shm/sf1x (round-7 optimization infra; the driver's own sf1.0 is
regenerated on its side — this local analogue exists so optimizations
are validated at both the default sf0.1 and a 10x table size, per the
round instructions "optimizations must hold at both sizes").

Method: each table is unioned 10x with keys shifted by copy*stride so
key uniqueness and join fan-outs are preserved; document texts get a
copy-specific suffix token so shingle/dedup structure stays realistic
(exact copies would inflate dup rates 10x); embeddings get fresh
seeded random vectors (the similarity ops' cost depends on row count
and dimension, not values). NOT deterministic vs the driver's sf1.0 —
used only for before/after timing, never for correctness or results.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_scrapper_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("BIGSF_DST", "/dev/shm/sf1x")
COPIES = int(os.environ.get("BIGSF_COPIES", "10"))

# key columns to shift per copy: table -> [(col, stride)]
SHIFTS = {
    "customer": [("c_custkey", 1_000_000)],
    "orders": [("o_orderkey", 10_000_000), ("o_custkey", 1_000_000)],
    "lineitem": [("l_orderkey", 10_000_000)],
    "supplier": [("s_suppkey", 1_000_000)],
    "part": [("p_partkey", 1_000_000)],
    "events": [("event_id", 10_000_000), ("user_id", 1_000_000)],
    "documents": [("doc_id", 1_000_000)],
    "nation": None,   # dimension tables copied as-is
    "region": None,
}


def main() -> None:
    spark = get_spark(app_name="make-bigsf", shuffle_partitions=64)
    os.makedirs(DST, exist_ok=True)
    for table, shifts in SHIFTS.items():
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        if shifts is None:
            out = src
        else:
            parts = []
            for c in range(COPIES):
                d = src
                for col, stride in shifts:
                    d = d.withColumn(col, F.col(col) + F.lit(c * stride))
                if table == "documents" and c > 0:
                    # copy-specific token keeps cross-copy shingles unique
                    d = d.withColumn(
                        "text",
                        F.concat(F.col("text"), F.lit(f" copytok{c}")),
                    )
                parts.append(d)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.repartition(16).write.mode("overwrite").parquet(
            f"{DST}/{table}.parquet")
        print(f"{table}: done")

    # embeddings: fresh seeded random vectors at 10x count (the ANN
    # ops' cost is a function of n and dim; values don't matter for
    # timing). label mirrors the source's int32 column.
    import numpy as np
    import pandas as pd

    n = 2000 * COPIES
    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((n, 64)).astype("float32")
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": [v for v in vecs],
        "label": rng.integers(0, 10, n).astype("int32"),
    })
    spark.createDataFrame(pdf).repartition(16).write.mode(
        "overwrite").parquet(f"{DST}/embeddings.parquet")
    print("embeddings: done")
    spark.stop()


if __name__ == "__main__":
    main()
