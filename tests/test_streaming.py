"""Structured Streaming: AvailableNow drain of the events table must
produce exactly the batch plan's result (§2.9)."""

import os
import shutil
import tempfile

from go_scrapper_spark.streaming.events_stream import (
    windowed_counts_batch,
    windowed_counts_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark):
    src = tempfile.mkdtemp(prefix="events-src-")
    ckpt = tempfile.mkdtemp(prefix="events-ckpt-")
    try:
        # stage the parquet into a stream-source dir
        spark.read.parquet(f"{SF_DIR}/events.parquet").write.mode("overwrite").parquet(src)
        windowed_counts_stream(spark, src, ckpt, "win_counts")
        got = sorted(
            tuple(r) for r in spark.table("win_counts").collect()
        )
        exp = sorted(tuple(r) for r in windowed_counts_batch(spark, src).collect())
        assert got == exp and len(got) > 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
