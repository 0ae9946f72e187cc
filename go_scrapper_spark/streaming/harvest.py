"""Streaming harvest mode (SURVEY.md §2.9 — the optional
Trigger.AvailableNow wrapper around the batch extraction stage).

A continuously-landing pages directory (e.g. WARC conversions arriving
from fetchers) is drained as a file-source stream; each micro-batch
runs the same vectorized extraction used by the batch crawl and writes
reviews to a parquet sink. Exactly-once comes from the streaming
checkpoint (source offsets) + an IDEMPOTENT per-batch write: output is
partitioned by batch_id and each batch dynamically overwrites only its
own partition, so a batch retried after a partial write replaces its
partition instead of duplicating rows (foreachBatch alone is only
at-least-once).

This demonstrates the engine's data plane running under Structured
Streaming unchanged — the frontier scheduler itself stays an iterative
batch loop (its state transitions are driver-decided supersteps, which
Structured Streaming's model does not fit; see SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from go_scrapper_spark.functions.extract import extract_pages

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def harvest_stream(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain ``pages_dir`` with AvailableNow; per micro-batch, extract
    reviews and append to ``out_dir`` (parquet)."""
    stream = spark.readStream.schema(PAGES_DDL).parquet(pages_dir)

    def process(batch_df, batch_id: int):
        fetched = batch_df.select(
            "url", "html",
            F.lit(0).alias("depth"),
            F.lit(0).cast("long").alias("seq"),
            F.lit(0).alias("fpo"),
        )
        reviews = extract_pages(fetched).filter(F.col("kind") == "review")
        (
            reviews.select(
                "url", "review_id", "author_id", "author_name", "text",
                "rating", "source_date", "review_hash",
                F.lit(batch_id).alias("batch_id"),
            )
            # idempotent retry: overwrite exactly this batch's partition
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
