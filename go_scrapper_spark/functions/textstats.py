"""Text analysis for corpus building (training-data pipeline tier).

Language-ID heuristic, quality scoring, token counting, document
fingerprinting — all native Spark SQL expressions (codegen'd, no
Python), integer/string-exact so the DuckDB oracle verifies them
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# function-word list for the density heuristic (the synthetic corpus
# vocabulary contains 'the' and 'a'; real deployments swap per-language
# stopword tables here)
FUNC_WORDS = ("the", "a")


def token_count(text_col) -> F.Column:
    return F.size(F.split(text_col, r"\s+"))


# GPT-2-style pretokenizer approximation: letter runs and digit runs
# each become one token; every punctuation CHARACTER is its own token.
# The DuckDB oracle interpolates this same constant (SQL_TEXT_QUALITY),
# so engine and oracle cannot drift.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_ish_token_count(text_col_name: str) -> F.Column:
    """Token count under the BPE-ish pretokenizer regex (the unit an
    LLM-data pipeline budgets by, vs whitespace words)."""
    return F.expr(
        f"size(regexp_extract_all({text_col_name}, '{BPE_ISH_PATTERN}', 0))"
    )


def func_word_count(text_col) -> F.Column:
    arr = F.split(text_col, " ")
    return F.size(F.filter(arr, lambda w: w.isin(*FUNC_WORDS)))


def text_quality(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Integer quality features + a coarse keep/drop band, the
    C4/Gopher-style filter shape."""
    t = F.col(text_col)
    n_tok = token_count(t)
    n_stop = func_word_count(t)
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        bpe_ish_token_count(text_col).cast("long").alias("n_bpe_tokens"),
        n_stop.alias("n_func_words"),
        # mean token length in milli-chars: exact integer division
        F.floor(F.length(t) * 1000 / n_tok).cast("long").alias("milli_chars_per_token"),
        F.when((n_tok >= 20) & (n_stop * 100 >= n_tok * 2), F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("quality_band"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Function-word-density language guess (n-gram heuristic class).
    Density is reported in exact permille."""
    t = F.col(text_col)
    n_tok = token_count(t)
    density = F.floor(func_word_count(t) * 1000 / n_tok).cast("long")
    return docs.select(
        F.col(id_col),
        density.alias("func_permille"),
        F.when(density >= 80, F.lit("en_like")).otherwise(F.lit("other")).alias("lang_guess"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Document fingerprints: whole-text md5 of the normalized text +
    a winnowing-style min-hash over character 16-grams (the rolling-
    hash fingerprint class, exact via md5 ordering)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    grams = F.expr(
        "transform(sequence(1, greatest(length(lower(regexp_replace(text, '\\\\s+', ' '))) - 15, 1)), "
        "i -> substring(lower(regexp_replace(text, '\\\\s+', ' ')), i, 16))"
    )
    return docs.select(
        F.col(id_col),
        F.md5(norm.cast("binary")).alias("doc_md5"),
        F.array_min(F.transform(grams, lambda g: F.md5(g.cast("binary")))).alias("min_gram_md5"),
    )
