"""Storage-bucketing evidence for the scale story (SURVEY §4 / README
"Wave selection windows partition by host — aligned with storage
bucketing"): when the frontier lives in a host-bucketed table (the
Iceberg `bucket(P, host)` layout in production; Spark bucketed tables
here), the per-host wave-selection window and a host-keyed join read
the bucketed layout directly — the executed plan contains NO Exchange
on the bucketed side. This is the property that keeps the 10^10-row
frontier from reshuffling every superstep."""

import pytest
from pyspark.sql import functions as F

from go_scrapper_spark.operators import wave


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    rows = [(f"h{i % 13}.example.com", f"https://h{i % 13}.example.com/p/{i}",
             i % 4, i) for i in range(2000)]
    df = spark.createDataFrame(rows, "host string, url string, depth int, seq long")
    spark.sql("DROP TABLE IF EXISTS frontier_bucketed")
    (df.write.bucketBy(8, "host").sortBy("host")
       .option("path", str(base / "frontier"))
       .saveAsTable("frontier_bucketed"))
    yield spark.table("frontier_bucketed")
    spark.sql("DROP TABLE IF EXISTS frontier_bucketed")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_wave_window_reads_buckets_no_exchange(spark, bucketed):
    budgets = spark.createDataFrame(
        [(f"h{i}.example.com", 2) for i in range(13)], "host string, k_host int")
    out = wave.select_wave(bucketed, budgets)
    plan = _plan(out)
    # the broadcast of the budgets side is expected; what must NOT
    # appear is a hash/range repartition of the frontier
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert out.count() == 13 * 2


def test_host_equijoin_between_bucketed_tables_no_shuffle(spark, bucketed,
                                                          tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets2")
    robots = spark.createDataFrame(
        [(f"h{i % 13}.example.com", 1000 * i) for i in range(13)],
        "host string, crawl_delay_ms long")
    spark.sql("DROP TABLE IF EXISTS robots_bucketed")
    (robots.write.bucketBy(8, "host").sortBy("host")
        .option("path", str(base / "robots"))
        .saveAsTable("robots_bucketed"))
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed.join(spark.table("robots_bucketed"), "host")
        plan = _plan(joined)
        assert "Exchange" not in plan  # co-bucketed: zero shuffles
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS robots_bucketed")
