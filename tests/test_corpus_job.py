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


def test_decontam_stage_drops_eval_overlap(spark):
    docs = spark.read.parquet(DOCS)
    evals = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("eval_id"), "text")
    base, c0 = build_corpus(spark, docs, min_tokens=5, near_dup_matches=6)
    clean, c1 = build_corpus(spark, docs, min_tokens=5, near_dup_matches=6,
                             eval_df=evals, decontam_n=5)
    assert "after_decontam" in c1
    assert c1["after_decontam"] < c0["after_near_dup"]
    # every eval doc that survived the upstream stages must be gone
    # (it shares all its own n-grams with itself)
    survivors = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert not any(d % 10 == 0 for d in survivors
                   if d in {r["doc_id"] for r in base.select("doc_id").collect()})
