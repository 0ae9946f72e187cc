"""Training-data decontamination against an evaluation set.

Every serious LLM corpus pipeline removes (or at least flags)
training documents that textually overlap the benchmark/eval sets —
the GPT-3 appendix-C / Llama "n-gram decontamination" stage: a
training document is contaminated when it shares at least one
normalized word n-gram with any eval document.

Spark-first shape: the eval set is tiny relative to the corpus
(thousands of rows vs 10^9), so its distinct n-gram table is
broadcast; the corpus side explodes its shingles map-side and
broadcast-joins — NO shuffle touches the 100 TB side until the final
per-document tally (ONE shuffle on the doc id). All expressions are
native SQL (the shingler is dedupe.word_shingles, codegen'd), which
keeps the operator value-exact for the DuckDB oracle.

Normalization before shingling (both sides, identical): lowercase,
collapse whitespace runs to one space, trim. Deliberately no
punctuation stripping — it keeps the oracle regex-free and the
contract simple; callers wanting looser matching pre-normalize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_scrapper_spark.operators.dedupe import word_shingles


def _norm(col: F.Column) -> F.Column:
    return F.trim(F.regexp_replace(F.lower(col), F.lit(r"\s+"), F.lit(" ")))


def _shingle_set(df: DataFrame, id_col: str, text_col: str,
                 n: int) -> DataFrame:
    normed = df.select(
        F.col(id_col).alias("_id"), _norm(F.col(text_col)).alias("_t")
    )
    # no < n-word prefilter needed (round 7): word_shingles yields an
    # empty array for short docs (its size guard is inside the bound
    # transform) and explode drops it — the old filter re-split every
    # document a second time just to measure it
    return (
        normed.select("_id", F.explode(word_shingles("_t", n)).alias("ngram"))
        .filter(F.col("ngram") != "")
    )


def contamination_report(docs: DataFrame, eval_df: DataFrame, n: int = 8,
                         id_col: str = "doc_id", text_col: str = "text",
                         eval_id_col: str = "eval_id",
                         eval_text_col: str = "text",
                         broadcast_eval: bool = True) -> DataFrame:
    """One row per CONTAMINATED training document:
    (id, n_hits, n_eval_docs) — the number of distinct shared n-grams
    and the number of distinct eval documents hit. Clean documents do
    not appear (the report is eval-sized × hit-rate, tiny)."""
    evals = (
        _shingle_set(eval_df, eval_id_col, eval_text_col, n)
        .withColumnRenamed("_id", "_eval_id")
        .distinct()
    )
    # typical eval sets (thousands of docs -> a few M n-grams) fit a
    # broadcast and keep the corpus shuffle-free; for very large eval
    # suites (~10^8 grams) pass broadcast_eval=False to fall back to a
    # shuffle-hash equi-join on the n-gram key
    evals = F.broadcast(evals) if broadcast_eval else evals.hint("shuffle_hash")
    hits = _shingle_set(docs, id_col, text_col, n).join(evals, "ngram")
    return (
        hits.groupBy("_id")
        .agg(
            F.count_distinct("ngram").alias("n_hits"),
            F.count_distinct("_eval_id").alias("n_eval_docs"),
        )
        .select(F.col("_id").alias(id_col), "n_hits", "n_eval_docs")
    )


def decontaminate(docs: DataFrame, eval_df: DataFrame, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  eval_id_col: str = "eval_id",
                  eval_text_col: str = "text",
                  broadcast_eval: bool = True) -> DataFrame:
    """The corpus minus every contaminated document (left-anti join on
    the report — the report side is tiny, so the anti-join broadcasts
    and the corpus never shuffles). ``broadcast_eval=False`` switches
    the eval-shingle join to the shuffle-hash fallback for eval suites
    too large to broadcast (~10^8 grams) — same results, one extra
    corpus-side shuffle on the n-gram key (round 6: previously only
    ``contamination_report`` exposed the switch, so a huge eval suite
    would OOM the broadcast with no knob to flip)."""
    bad = contamination_report(
        docs, eval_df, n, id_col, text_col, eval_id_col, eval_text_col,
        broadcast_eval=broadcast_eval,
    ).select(id_col)
    return docs.join(F.broadcast(bad), id_col, "left_anti")
