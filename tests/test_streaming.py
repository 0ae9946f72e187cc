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


def test_harvest_stream_equals_batch_extraction(spark):
    """foreachBatch harvest drain == batch extraction over the same
    pages; a second drain with the same checkpoint adds nothing
    (exactly-once via source offsets)."""
    import tempfile

    from pyspark.sql import functions as F

    from go_scrapper_spark.functions.extract import extract_pages
    from go_scrapper_spark.sources import synthetic_web as sw
    from go_scrapper_spark.streaming.harvest import harvest_stream

    cfg = sw.WebConfig(n_biz=6)
    src = tempfile.mkdtemp(prefix="harvest-src-")
    out = tempfile.mkdtemp(prefix="harvest-out-") + "/reviews"
    ckpt = tempfile.mkdtemp(prefix="harvest-ckpt-")
    try:
        sw.generate_pages_df(spark, cfg, n_partitions=2).write.mode("overwrite").parquet(src)
        harvest_stream(spark, src, out, ckpt)
        got = spark.read.parquet(out)
        exp = extract_pages(
            spark.read.parquet(src).select(
                "url", "html", F.lit(0).alias("depth"),
                F.lit(0).cast("long").alias("seq"), F.lit(0).alias("fpo"),
            )
        ).filter(F.col("kind") == "review")
        assert got.count() == exp.count() > 0
        key = lambda r: (r["url"], r["review_id"] or "", r["review_hash"], r["text"])
        g = sorted(map(key, got.select("url", "review_id", "review_hash", "text").collect()))
        e = sorted(map(key, exp.select("url", "review_id", "review_hash", "text").collect()))
        assert g == e
        # idempotent re-drain: offsets already committed
        harvest_stream(spark, src, out, ckpt)
        assert spark.read.parquet(out).count() == len(g)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_dedup_stream_equals_batch_and_survives_restart(spark):
    """Streaming exact dedup == batch distinct over the same files;
    the seen-set lives in the checkpoint, so a second drain over NEW
    files (containing both fresh docs and duplicates of batch-1 docs)
    emits only the fresh content — exactly-once dedup across
    restarts."""
    from pyspark.sql import Row

    from go_scrapper_spark.streaming.dedup_stream import dedup_batch, dedup_stream

    src = tempfile.mkdtemp(prefix="dedup-src-")
    ckpt = tempfile.mkdtemp(prefix="dedup-ckpt-")
    out = tempfile.mkdtemp(prefix="dedup-out-") + "/deduped"
    try:
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        batch1 = [
            Row(doc_id=0, ts=t0, text="alpha"),
            Row(doc_id=1, ts=t0, text="beta"),
            Row(doc_id=2, ts=t0, text="alpha"),  # in-batch dup
        ]
        spark.createDataFrame(batch1).coalesce(1).write.mode("append").parquet(src)
        dedup_stream(spark, src, ckpt, out)
        got1 = {r["content_hash"]: r["text"] for r in spark.read.parquet(out).collect()}
        exp1 = {r["content_hash"]: r["text"] for r in dedup_batch(spark, src).collect()}
        assert got1 == exp1 and len(got1) == 2

        # restart drain: one fresh doc + one duplicate of batch 1
        batch2 = [
            Row(doc_id=3, ts=t0, text="gamma"),
            Row(doc_id=4, ts=t0, text="beta"),  # cross-restart dup
        ]
        spark.createDataFrame(batch2).coalesce(1).write.mode("append").parquet(src)
        dedup_stream(spark, src, ckpt, out)
        texts2 = sorted(r["text"] for r in spark.read.parquet(out).collect())
        # beta NOT re-emitted (state recovered from checkpoint): the
        # sink holds each distinct content exactly once
        assert texts2 == ["alpha", "beta", "gamma"]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


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
