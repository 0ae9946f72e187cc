"""Wave selection — the core frontier-scheduler operator (SURVEY.md W3).

Per-host priority dequeue: within each host take the top-k pending
URLs ordered by (depth, seq, url). This is the Spark expression of the
reference's issue order (profile → feed start=0,10,… → non-rec root →
non-rec 0,10,…; main.go:572-576, 584-594, 808-812) with the politeness
cap (colly LimitRule Parallelism/Delay, collyfunc.go:115-119, 179)
enforced by k.

Scale notes: the window partitions by host — the same key the frontier
table is bucketed by, so with storage-partitioned reads the window
needs no extra shuffle. k bounds each host's rows per wave, so the
Zipf head cannot produce a hot partition downstream (skew is
structurally capped before the fetch join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def wave_order():
    return [F.col("depth").asc(), F.col("seq").asc(), F.col("url").asc()]


def host_budget(robots_df: DataFrame, window_ms: int, default_k: int = 10) -> DataFrame:
    """Window-based rate accounting (A5): per-host fetch budget per
    superstep = min(max_parallel, floor(window / crawl_delay)).
    With the reference's own config (3 s delay, parallelism 10,
    collyfunc.go:115-119,179) and a 30 s superstep window, k = 10."""
    return robots_df.select(
        "host",
        F.least(
            F.coalesce(F.col("max_parallel"), F.lit(default_k)),
            F.floor(
                F.lit(window_ms) / F.coalesce(F.col("crawl_delay_ms"), F.lit(3000))
            ).cast("int"),
        ).alias("k_host"),
    )


def select_wave(pending: DataFrame, budgets: DataFrame, default_k: int = 10) -> DataFrame:
    """Top-k-per-host dequeue. ``budgets`` (host, k_host) is tiny
    (one row per host) → broadcast join, no shuffle of the frontier
    beyond the window's own host partitioning."""
    w = Window.partitionBy("host").orderBy(*wave_order())
    return (
        pending.join(F.broadcast(budgets), "host", "left")
        .withColumn("k_host", F.coalesce(F.col("k_host"), F.lit(default_k)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("k_host"))
        .drop("_rn", "k_host")
    )
