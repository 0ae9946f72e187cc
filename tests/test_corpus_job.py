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
    result, counts = build_corpus(spark, docs, min_tokens=5, near_dup_matches=6,
                                  verbose_counts=True)
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
    base, c0 = build_corpus(spark, docs, min_tokens=5, near_dup_matches=6,
                            verbose_counts=True)
    clean, c1 = build_corpus(spark, docs, min_tokens=5, near_dup_matches=6,
                             eval_df=evals, decontam_n=5,
                             verbose_counts=True)
    assert "after_decontam" in c1
    assert c1["after_decontam"] < c0["after_near_dup"]
    # every eval doc that survived the upstream stages must be gone
    # (it shares all its own n-grams with itself)
    survivors = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert not any(d % 10 == 0 for d in survivors
                   if d in {r["doc_id"] for r in base.select("doc_id").collect()})


def test_update_corpus_incremental_semantics(spark):
    from corpus import update_corpus

    docs = spark.read.parquet(DOCS)
    base, _ = build_corpus(spark, docs.filter(F.col("doc_id") < 60),
                           min_tokens=5, near_dup_matches=6)
    existing = base.persist()
    n0 = existing.count()
    assert n0 > 0

    # the new segment: exact copies of standing docs (shifted ids) +
    # genuinely new docs
    copies = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text",
        "lang", "source", "n_chars")
    fresh = docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 90))
    segment = copies.unionByName(fresh)

    delta, counts = update_corpus(spark, existing, segment,
                                  min_tokens=5, near_dup_matches=6)
    out = delta.persist()
    delta_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    # every exact copy of a standing doc is gone
    assert not any(d >= 100000 for d in delta_ids)
    # the delta introduces no content hash the corpus already holds
    merged = existing.select("text").union(out.select("text"))
    dup = (merged.groupBy(F.md5(F.col("text").cast("binary"))).count()
           .filter(F.col("count") > 1).count())
    assert dup == 0
    assert counts["after_exact_dedup"] <= counts["after_quality"]
    assert "lang_guess" in out.columns and len(delta_ids) > 0


def test_update_corpus_drops_near_dups_of_existing(spark):
    from corpus import update_corpus

    base_rows = [(i, f"the standing corpus document number {i} talks about "
                     f"topic {i} in enough detail to pass every filter with "
                     f"plenty of ordinary words here")
                 for i in range(5)]
    existing = spark.createDataFrame(
        base_rows, "doc_id long, text string")
    # near-dup of standing doc 3 (one word changed), plus a fresh doc
    seg_rows = [
        (900, base_rows[3][1].replace("detail", "depth")),
        (901, "an entirely different new document with completely other "
              "content and themes that overlap nothing of what is already "
              "in the collection at all for any reader"),
    ]
    segment = spark.createDataFrame(seg_rows, "doc_id long, text string")
    delta, counts = update_corpus(spark, existing, segment,
                                  min_tokens=5, near_dup_matches=4)
    ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    assert ids == {901}  # near-dup dropped (4/6 sig match), fresh kept
    # default counts never scan the standing corpus (verbose only)
    assert "existing" not in counts
    _, vc = update_corpus(spark, existing, segment, min_tokens=5,
                          near_dup_matches=4, verbose_counts=True)
    assert vc["existing"] == 5


def test_cross_lsh_sigs_path_equals_docs_path(spark):
    """minhash_lsh_pairs_cross(existing_sigs=stored table) — the
    production nightly mode where the standing corpus is never
    re-shingled — must produce exactly the pairs the raw-docs path
    produces."""
    from go_scrapper_spark.operators import dedupe

    docs = spark.read.parquet(DOCS)
    existing = docs.filter(F.col("doc_id") < 40)
    segment = docs.filter(F.col("doc_id") < 15).select(
        (F.col("doc_id") + 500).alias("doc_id"), "text")

    via_docs = {(r["doc_new"], r["doc_old"], r["sig_matches"])
                for r in dedupe.minhash_lsh_pairs_cross(
                    segment, existing).collect()}
    sigs = dedupe.minhash_signatures(existing)
    via_sigs = {(r["doc_new"], r["doc_old"], r["sig_matches"])
                for r in dedupe.minhash_lsh_pairs_cross(
                    segment, existing_sigs=sigs).collect()}
    assert via_docs == via_sigs and len(via_docs) >= 15

    with pytest.raises(ValueError):
        dedupe.minhash_lsh_pairs_cross(segment)
    with pytest.raises(ValueError):
        dedupe.minhash_lsh_pairs_cross(segment, existing,
                                       existing_sigs=sigs)


def test_update_corpus_with_stored_sigs_matches_raw(spark):
    from corpus import update_corpus

    docs = spark.read.parquet(DOCS)
    existing = docs.filter(F.col("doc_id") < 50).select("doc_id", "text")
    segment = docs.filter(
        (F.col("doc_id") >= 40) & (F.col("doc_id") < 70)
    ).select((F.col("doc_id") + 1000).alias("doc_id"), "text")

    from go_scrapper_spark.operators.dedupe import minhash_signatures
    sigs = minhash_signatures(existing)
    raw, _ = update_corpus(spark, existing, segment,
                           min_tokens=5, near_dup_matches=6)
    via, _ = update_corpus(spark, existing, segment, min_tokens=5,
                           near_dup_matches=6, existing_sigs=sigs)
    assert ({r["doc_id"] for r in raw.select("doc_id").collect()}
            == {r["doc_id"] for r in via.select("doc_id").collect()})


def test_substring_k_stage_strips_planted_spans(spark):
    """build_corpus(substring_k=K): a K-token span planted across docs
    keeps exactly one copy (the (doc_id, pos)-first), the stage count
    lands in counts/stage_secs, and a doc that is entirely the span
    drops from the corpus."""
    # every doc needs >= 20 tokens and >= 2% function words to clear
    # the quality keep-band; the span carries its own stopwords so the
    # span-only doc reaches the substring stage and empties THERE
    span = "the quick brown fox and seven"
    docs = spark.createDataFrame([
        (1, "this is a unique opening with plenty of words to pass "
            "the gate " + span + " and some more unique trailing words"),
        (2, "another document that has its own very different words "
            "in it " + span + " with extra trailing content for the gate"),
        (3, " ".join([span] * 4)),
        (4, "an independent document with enough tokens and function "
            "words to pass the quality gate easily on its own good merits"),
    ], "doc_id long, text string")
    result, counts = build_corpus(spark, docs, min_tokens=5, verbose_counts=True,
                                  near_dup_matches=6, substring_k=6)
    rows = {r["doc_id"]: r["text"] for r in result.collect()}
    assert counts["after_substring_dedup"] < counts["after_near_dup"]
    assert "substring_dedup" in counts["stage_secs"]
    assert span in rows[1]            # canonical copy survives in doc 1
    assert span not in rows[2] and "very different words" in rows[2]
    assert 3 not in rows              # span-only doc empties and drops
    assert rows[4].startswith("an independent")
