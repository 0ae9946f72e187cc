"""Incremental-crawl truncation (SURVEY.md F4/W2; main.go:950-960).

In incremental mode the reference walks its date-desc sorted result
list and cuts at the FIRST review whose hash appears in the task's
``last_review_hashes`` — that review and everything after it are
already known from the previous run. The Spark expression: number the
rows in the defined output order (W1), find the minimum row number
whose hash is in the seen set, keep strictly earlier rows.

The reference then keeps widening pagination windows by 50 until the
hash is found (G3, main.go:603-654) — a fetch-avoidance optimization
of the same semantics; the engine's scheduler analogue is planned as a
per-task early-exit predicate on wave selection (see ROADMAP in
README). The truncation operator below is the semantics contract both
share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def order_cols():
    """The engine's deterministic W1 output order (date desc, arrival)."""
    return [
        F.col("posted_at").desc(),
        F.col("wave_id").asc(),
        F.col("arrival_idx").asc(),
        F.col("url").asc(),
    ]


def truncate_per_task(
    extracted: DataFrame,
    inc_hashes: dict[int, tuple[str, ...]],
    seed_seq_stride: int = 10_000_000,
) -> DataFrame:
    """Multi-task cut-at-seen-hash (main.go:950-960 generalized): each
    incremental task truncates at the first row, in W1 output order,
    whose hash appears in THAT task's last_review_hashes. Tasks without
    hashes pass through untouched. The hash table is O(task config) →
    broadcast join; the cut is one window per task partition."""
    if not inc_hashes:
        return extracted
    spark = extracted.sparkSession
    hdf = spark.createDataFrame(
        [(tk, h) for tk, hs in inc_hashes.items() for h in hs],
        "_tk long, review_hash string",
    ).withColumn("_hit_flag", F.lit(1))
    str100 = seed_seq_stride * 100
    tk = F.floor(F.col("arrival_idx") / str100).cast("long")
    marked = extracted.withColumn("_tk", tk).join(
        F.broadcast(hdf), ["_tk", "review_hash"], "left"
    )
    w = Window.partitionBy("_tk").orderBy(*order_cols())
    wcut = Window.partitionBy("_tk")
    rn = F.row_number().over(w)
    marked = marked.withColumn("_rn", rn)
    cut = F.min(F.when(F.col("_hit_flag").isNotNull(), F.col("_rn"))).over(wcut)
    return (
        marked.withColumn("_cut", cut)
        .filter(F.col("_cut").isNull() | (F.col("_rn") < F.col("_cut")))
        .drop("_tk", "_hit_flag", "_rn", "_cut")
    )


def truncate_at_seen_hash(
    extracted: DataFrame,
    last_hashes: list[str],
    partition_col: str | None = None,
) -> DataFrame:
    """Drop the first seen-hash row and everything after it in output
    order. ``partition_col`` scopes the cut per task/business (the
    reference is single-task; multi-task crawls cut independently)."""
    if not last_hashes:
        return extracted
    w = Window.partitionBy(partition_col) if partition_col else Window.partitionBy()
    w = w.orderBy(*order_cols())
    hashes = F.array(*[F.lit(h) for h in last_hashes])
    rn = F.row_number().over(w)
    with_rn = extracted.withColumn("_rn", rn).withColumn(
        "_hit", F.array_contains(hashes, F.col("review_hash"))
    )
    wcut = (
        Window.partitionBy(partition_col) if partition_col else Window.partitionBy()
    )
    cut = F.min(F.when(F.col("_hit"), F.col("_rn"))).over(wcut)
    return (
        with_rn.withColumn("_cut", cut)
        .filter(F.col("_cut").isNull() | (F.col("_rn") < F.col("_cut")))
        .drop("_rn", "_hit", "_cut")
    )
