"""Partitioned bloom seen-filter: no false negatives ever (the crawl
must never silently drop an unseen URL), exactness of the two-phase
filter vs a plain anti-join, and incremental merge correctness."""

import pytest
from pyspark.sql import functions as F

from go_scrapper_spark.operators import seenfilter as sf

N_BUCKETS = 8


@pytest.fixture(scope="module")
def seen(spark):
    return (
        spark.range(0, 2000)
        .select(
            F.xxhash64(F.concat(F.lit("seen-url-"), F.col("id"))).alias("url_hash")
        )
        .withColumn("bucket", F.pmod("url_hash", F.lit(N_BUCKETS)).cast("int"))
        .persist()
    )


@pytest.fixture(scope="module")
def blooms(spark, seen):
    return sf.collect_blooms(sf.build_blooms(seen, expected_per_bucket=300))


def test_no_false_negatives(spark, seen, blooms):
    """Every member hash must test positive in its bucket's bloom."""
    checked = seen.withColumn(
        "hit", sf.might_contain_udf(blooms)(F.col("url_hash"), F.col("bucket"))
    )
    assert checked.filter(~F.col("hit")).count() == 0


def test_fpp_reasonable(spark, blooms):
    """Non-members should mostly test negative (fpp target 1%)."""
    outsiders = (
        spark.range(10_000, 30_000)
        .select(F.xxhash64(F.concat(F.lit("other-"), F.col("id"))).alias("url_hash"))
        .withColumn("bucket", F.pmod("url_hash", F.lit(N_BUCKETS)).cast("int"))
    )
    hits = (
        outsiders.withColumn(
            "hit", sf.might_contain_udf(blooms)(F.col("url_hash"), F.col("bucket"))
        )
        .filter(F.col("hit"))
        .count()
    )
    assert hits / 20_000 < 0.05


def test_filter_unseen_equals_plain_antijoin(spark, seen, blooms):
    """The two-phase (bloom + exact) filter must return exactly the
    plain anti-join result — same rows, nothing dropped, nothing extra."""
    cands = spark.range(0, 4000).select(
        F.when(
            F.col("id") < 1000, F.concat(F.lit("seen-url-"), F.col("id"))
        ).otherwise(F.concat(F.lit("new-url-"), F.col("id"))).alias("url")
    )
    got = sorted(
        r["url"] for r in sf.filter_unseen(cands, seen, blooms, N_BUCKETS).collect()
    )
    exp = sorted(
        r["url"]
        for r in cands.join(
            seen.select(F.col("url_hash").alias("_sh")),
            F.xxhash64(cands["url"]) == F.col("_sh"),
            "left_anti",
        ).collect()
    )
    assert got == exp
    assert len(got) == 3000


def test_filter_unseen_join_equals_plain_antijoin(spark, seen):
    """The TABLE-cogroup variant (filter_unseen_join — the engine's
    use_bloom path, no driver dict) must also return exactly the plain
    anti-join result."""
    blooms_df = sf.build_blooms(seen, expected_per_bucket=300)
    cands = spark.range(0, 4000).select(
        F.when(
            F.col("id") < 1000, F.concat(F.lit("seen-url-"), F.col("id"))
        ).otherwise(F.concat(F.lit("new-url-"), F.col("id"))).alias("url")
    )
    got = sorted(
        r["url"]
        for r in sf.filter_unseen_join(cands, seen, blooms_df, N_BUCKETS).collect()
    )
    exp = sorted(
        r["url"]
        for r in cands.join(
            seen.select(F.col("url_hash").alias("_sh")),
            F.xxhash64(cands["url"]) == F.col("_sh"),
            "left_anti",
        ).collect()
    )
    assert got == exp
    assert len(got) == 3000


def test_merge_bloom_delta_mixed_shapes(spark, seen):
    """Resume-with-different-config safety: merging a delta with a
    DIFFERENT bloom shape must probe existing buckets with their own
    stored (m_bits, k) — no out-of-bounds, no false negatives — while
    new buckets take the new shape."""
    base = seen.filter(F.pmod("url_hash", F.lit(2)) == 0)
    delta = seen.filter(F.pmod("url_hash", F.lit(2)) != 0)
    blooms = sf.build_blooms(base, expected_per_bucket=300)  # old shape
    new_shape = sf.bloom_params(5000, 0.001)  # much larger new shape
    merged_df = sf.merge_bloom_delta(blooms, delta, shape=new_shape)
    rows = {int(r["bucket"]): (int(r["m_bits"]), int(r["k_hashes"]))
            for r in merged_df.collect()}
    base_buckets = {int(r["bucket"]) for r in
                    sf.build_blooms(base, expected_per_bucket=300).collect()}
    old_shape = sf.bloom_params(300)
    for bk, shape in rows.items():
        # pre-existing buckets keep their stored shape; delta-only
        # buckets take the caller's new shape
        assert shape == (old_shape if bk in base_buckets else new_shape), (bk, shape)
    merged = sf.collect_blooms(merged_df)
    checked = seen.withColumn(
        "hit", sf.might_contain_udf(merged)(F.col("url_hash"), F.col("bucket"))
    )
    assert checked.filter(~F.col("hit")).count() == 0


def test_merge_bloom_delta(spark, seen):
    """Blooms built incrementally (base + delta) behave like blooms
    built from the full set: still zero false negatives on the union."""
    base = seen.filter(F.pmod("url_hash", F.lit(2)) == 0)
    delta = seen.filter(F.pmod("url_hash", F.lit(2)) != 0)
    blooms = sf.build_blooms(base, expected_per_bucket=300)
    merged = sf.collect_blooms(sf.merge_bloom_delta(blooms, delta))
    checked = seen.withColumn(
        "hit", sf.might_contain_udf(merged)(F.col("url_hash"), F.col("bucket"))
    )
    assert checked.filter(~F.col("hit")).count() == 0
