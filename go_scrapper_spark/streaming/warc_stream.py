"""Streaming WARC ingestion (§2.9 × the Common-Crawl source): parse
web archives as they LAND — the continuous-arrival twin of
sources/warc.py's batch ``warc_to_pages``.

A production corpus build watches an object-store prefix where crawl
segments appear over hours; Structured Streaming's file source tracks
which blob files are already processed in the checkpoint, so ingest
is exactly-once per archive file across restarts, with zero
bookkeeping code. The per-file ``mapInPandas`` parse kernel is the
SAME function the batch path uses (sources/warc.py ``parse_warc`` —
mapInPandas is streaming-capable), so stream and batch results are
identical by construction; the test asserts it anyway.

Scale shape: file-source listing is the only driver-side work; each
micro-batch is embarrassingly parallel per archive blob (no shuffle,
no state). maxFilesPerTrigger bounds micro-batch size so a backlog
of 100k segment files drains in steady, memory-bounded batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WARC_FILES_DDL = "file_id long, warc binary"


def read_warc_stream(spark: SparkSession, files_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming (file_id, warc) blobs → streaming pages frame
    (url, warc_ts, html): 200-response records only, exactly the
    batch ``warc_to_pages`` projection."""
    from go_scrapper_spark.sources.warc import warc_to_pages

    reader = spark.readStream.schema(WARC_FILES_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    blobs = reader.parquet(files_dir)
    return warc_to_pages(blobs)


def warc_ingest_stream(spark: SparkSession, files_dir: str,
                       checkpoint_dir: str, out_dir: str,
                       max_files_per_trigger: int | None = None) -> None:
    """Drain ``files_dir`` with Trigger.AvailableNow into a parquet
    pages table. The file-source log in the checkpoint makes each
    archive file exactly-once across restarts: re-running after new
    files land parses ONLY the new files (tested, including a
    kill-free incremental drain)."""
    pages = read_warc_stream(spark, files_dir, max_files_per_trigger)
    (
        pages.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
