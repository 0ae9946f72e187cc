"""End-to-end corpus-build pipeline (jobs/corpus.py): quality gate →
exact dedup → near-dup prune → language-partitioned output. Counts
must be monotone non-increasing, survivors contain no exact dups, and
the output is partitioned by lang_guess."""

import glob
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/jobs")
from corpus import build_corpus  # noqa: E402

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs = spark.read.parquet(DOCS)
    result, counts = build_corpus(spark, docs, min_tokens=5, near_dup_matches=6)
    out = str(tmp_path_factory.mktemp("corpus") / "out")
    result.write.mode("overwrite").partitionBy("lang_guess").parquet(out)
    return spark, counts, out


def test_stage_counts_monotone(built):
    _spark, counts, _out = built
    seq = [counts["input"], counts["after_quality"],
           counts["after_exact_dedup"], counts["after_near_dup"]]
    assert seq == sorted(seq, reverse=True)
    assert counts["after_near_dup"] > 0


def test_no_exact_dups_survive(built):
    spark, _counts, out = built
    df = spark.read.parquet(out)
    dups = (
        df.groupBy(F.md5(F.col("text").cast("binary")))
        .count()
        .filter(F.col("count") > 1)
    )
    assert dups.count() == 0


def test_output_partitioned_by_lang(built):
    spark, counts, out = built
    parts = glob.glob(out + "/lang_guess=*")
    assert parts, "expected lang_guess partition directories"
    assert spark.read.parquet(out).count() == counts["after_near_dup"]
