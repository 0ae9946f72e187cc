"""Structured Streaming surface (SURVEY.md §2.9).

The reference is a one-shot batch crawl — no event-time processing —
so the engine's streaming tier is the standard ingest shape a crawl
metrics/feed pipeline needs: file-source stream → watermark → windowed
aggregation → AvailableNow drain. The same plan runs as a batch query
(``windowed_counts_batch``), which is how the test proves the
streaming result exact.

A continuous crawl would wrap the superstep loop in foreachBatch with
the frontier as the state store; the batch engine (plans/crawl.py) is
already shaped for that (each wave is one self-contained plan over
snapshot-pinned inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _windowed(df: DataFrame) -> DataFrame:
    return (
        df.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("win_start_ms"),
            "event_type",
            "n",
        )
    )


def windowed_counts_stream(
    spark: SparkSession, events_dir: str, checkpoint_dir: str, out_table: str
) -> None:
    """Drain the events directory as a stream with Trigger.AvailableNow
    into an in-memory sink table."""
    stream = (
        spark.readStream.schema(EVENTS_DDL).parquet(events_dir)
    )
    q = (
        _windowed(stream)
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_counts_batch(spark: SparkSession, events_path: str) -> DataFrame:
    """The identical plan over the same files as a batch query —
    the oracle for the streaming result."""
    df = spark.read.parquet(events_path)
    return _windowed(df.withColumn("ts", F.col("ts").cast("timestamp")))
