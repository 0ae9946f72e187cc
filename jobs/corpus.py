"""Corpus-build pipeline (training-data tier, end-to-end composition).

    spark-submit --py-files dist/go_scrapper_spark.zip jobs/corpus.py \
        --docs /data/documents.parquet --out /corpus [--min-tokens 20]
        [--near-dup-matches 6]

Stages (each a native declarative plan; one JSON summary line printed):

1. quality gate    — textstats.text_quality keep-band (C4/Gopher shape)
2. exact dedup     — md5 content-hash group-by, canonical = min doc_id
3. near-dup prune  — MinHash+LSH candidate pairs with
                     >= --near-dup-matches matching signature
                     components → connected components (min-label
                     propagation, dedupe.connected_components) → keep
                     the min doc_id of each transitive cluster
4. language split  — textstats.lang_id; output parquet partitioned by
                     lang_guess (the layout a per-language training
                     mix reads back with partition pruning)

Scale notes: stages 1/4 are row-local (codegen), stage 2 one shuffle,
stage 3 the LSH band join plus component rounds bounded by cluster
diameter (near-dup clusters are shallow) — nothing quadratic, nothing
driver-side beyond the O(1) fixpoint counter.
"""

from __future__ import annotations

import argparse
import json


def build_corpus(spark, docs, min_tokens: int = 20, near_dup_matches: int = 6):
    """Returns (result_df, stage_counts). Pure plan construction plus
    the stage-count actions."""
    from pyspark.sql import functions as F

    from go_scrapper_spark.functions import textstats
    from go_scrapper_spark.operators import dedupe

    docs = docs.persist()
    counts = {"input": docs.count()}

    quality = textstats.text_quality(docs, text_col="text").filter(
        (F.col("quality_band") == "keep") & (F.col("n_tokens") >= min_tokens)
    )
    # persist each surviving set: the stage counts AND the final write
    # would otherwise re-execute the whole upstream chain (including the
    # LSH candidate join) once per downstream action
    kept = docs.join(quality.select("doc_id"), "doc_id", "left_semi").persist()
    counts["after_quality"] = kept.count()
    docs.unpersist()

    # exact dedup: canonical doc per content hash
    canon = dedupe.exact_dedup_groups(kept).select(
        F.col("canonical_id").alias("doc_id")
    )
    deduped = kept.join(canon, "doc_id", "left_semi").persist()
    counts["after_exact_dedup"] = deduped.count()
    kept.unpersist()

    # near-dup prune: strong candidate pairs → connected components →
    # keep exactly one doc (the min id) per TRANSITIVE cluster. A pure
    # pairwise drop-the-higher-id rule over-keeps on chains discovered
    # through a middle document (pairs (a,c),(b,c) with no (a,b) would
    # keep both a and b); component labeling closes the transitivity.
    pairs = dedupe.minhash_lsh_pairs(deduped).filter(
        F.col("sig_matches") >= near_dup_matches
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    clusters = dedupe.connected_components(
        deduped.select(F.col("doc_id").alias("doc")), edges
    )
    keepers = clusters.filter(F.col("doc") == F.col("cluster_id")).select(
        F.col("doc").alias("doc_id")
    )
    survivors = deduped.join(keepers, "doc_id", "left_semi").persist()
    counts["after_near_dup"] = survivors.count()
    deduped.unpersist()

    lang = textstats.lang_id(survivors).select("doc_id", "lang_guess")
    result = survivors.join(lang, "doc_id")
    return result, counts


def main() -> None:
    ap = argparse.ArgumentParser(prog="corpus")
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--near-dup-matches", type=int, default=6)
    args = ap.parse_args()

    from go_scrapper_spark.session import get_spark

    spark = get_spark(app_name="corpus-build")
    docs = spark.read.parquet(args.docs)
    result, counts = build_corpus(
        spark, docs, args.min_tokens, args.near_dup_matches
    )
    result.write.mode("overwrite").partitionBy("lang_guess").parquet(args.out)
    counts["written"] = spark.read.parquet(args.out).count()
    print(json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()
