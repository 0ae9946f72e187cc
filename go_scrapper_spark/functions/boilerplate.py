"""Boilerplate removal / main-content extraction (webtext tier).

The reference extracts *targeted* fields with CSS selectors
(main.go:355-931); a training-data pipeline additionally needs the
generic "strip the nav/footer/ads, keep the article" stage that every
web-corpus pipeline (jusText, Boilerpipe, trafilatura, CCNet's WET
post-filters) runs over raw HTML. This is a deterministic,
integer-exact variant of the classic block + link-density algorithm:

  1. drop comments and <script>/<style>/<noscript> subtrees;
  2. split the page into blocks on block-level tag boundaries
     (p, div, li, h1-6, table rows, nav, header, footer, ...);
  3. per block compute the tag-stripped, whitespace-collapsed text
     and the character mass of anchor text inside the block;
  4. keep blocks with at least ``min_text_len`` text characters and
     anchor-text density at most ``max_link_density_pct`` percent
     (integer cross-multiplication — no float thresholds);
  5. re-join the kept blocks with newlines, preserving page order.

Everything is native Spark SQL expressions (regexp_replace /
regexp_extract_all / higher-order array functions) — whole-stage
codegen, zero Python in the hot path, and exactly reproducible in
DuckDB for the value-exact oracle (``extract_main_content`` entry).
The regexes avoid backreferences deliberately: DuckDB's RE2 has none,
so the same pattern strings run on both engines.

At 100 TB the stage is embarrassingly parallel until the final
per-page reassembly: posexplode is pipeline-local and the groupBy on
the page id is the ONE shuffle (same key the pages table is already
laid out by in practice, so AQE coalesces it to a near-no-op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# block-level boundaries: opening OR closing forms, attrs allowed
BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|section|article|main|h[1-6]|li|ul|ol|dl|dt|dd"
    r"|table|thead|tbody|tfoot|tr|td|th|header|footer|nav|aside"
    r"|blockquote|form|fieldset|figure|figcaption|pre|hr)\b[^>]*>"
    r"|(?i)<br\s*/?>"
)

# no backreferences (RE2-compatible): one alternate per stripped tag
DROP_SUBTREES_RE = (
    r"(?is)<script\b[^>]*>.*?</script>"
    r"|(?is)<style\b[^>]*>.*?</style>"
    r"|(?is)<noscript\b[^>]*>.*?</noscript>"
    r"|(?s)<!--.*?-->"
)

ANCHOR_TEXT_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
TAG_RE = r"(?s)<[^>]*>"


def _visible_text(col: F.Column) -> F.Column:
    """Tag-stripped, whitespace-collapsed, trimmed text of a fragment."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(col, F.lit(TAG_RE), F.lit(" ")),
            F.lit(r"\s+"), F.lit(" "),
        )
    )


def extract_main_content(pages: DataFrame, id_col: str = "url",
                         html_col: str = "html",
                         min_text_len: int = 25,
                         max_link_density_pct: int = 33,
                         carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """One row per page: (id, main_text, n_blocks, n_good,
    total_chars, kept_chars).

    ``main_text`` is the newline-joined text of the kept blocks in
    original page order ('' when nothing qualifies); ``n_blocks``
    counts blocks with any visible text; ``total_chars``/``kept_chars``
    are the visible-text character masses before/after the filter
    (the corpus-level yield metric every pipeline reports). Pages with
    no visible text at all produce no output row (unchanged — the
    round-6 groupBy shape implied the same).

    Every block of a page comes from that page's ONE html row, so the
    whole stage is per-row-local. Round 7 rewrote the posexplode +
    groupBy(page) reassembly — which shuffled every page's entire
    visible text — as higher-order array expressions in a single
    projection chain: ZERO exchanges. The scored-block array and the
    kept subset are materialized as real intermediate columns (one
    evaluation per row; CollapseProject does not re-inline non-cheap
    expressions used more than once), and block order is the array
    order — no idx bookkeeping, no array_sort.

    ``carry_cols`` rides extra input columns through to the output
    unchanged — free now that the operator is one projection, and it
    lets callers drop the pages ⋈ result join-back entirely (measured
    at 10M docs: that join double-scans the html-bearing page
    checkpoint, ~295 s vs 59 s for the joinless shape — the dominant
    front-end term in jobs/corpus.py at scale)."""
    html = F.col(html_col).cast("string")
    cleaned = F.regexp_replace(html, F.lit(DROP_SUBTREES_RE), F.lit(" "))

    def link_chars(b) -> F.Column:
        return F.aggregate(
            F.transform(
                F.regexp_extract_all(b, F.lit(ANCHOR_TEXT_RE), F.lit(1)),
                lambda a: F.length(_visible_text(a)).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored_arr = F.filter(
        F.transform(
            F.split(cleaned, BLOCK_SPLIT_RE),
            lambda b: F.struct(
                _visible_text(b).alias("text"),
                link_chars(b).alias("lc"),
            ),
        ),
        lambda s: s["text"] != "",
    )

    def tl(s) -> F.Column:
        return F.length(s["text"]).cast("long")

    def good(s) -> F.Column:
        return (tl(s) >= F.lit(min_text_len)) & (
            s["lc"] * 100 <= F.lit(max_link_density_pct) * tl(s)
        )

    def char_sum(arr_col: str) -> F.Column:
        return F.aggregate(
            F.col(arr_col),
            F.lit(0).cast("long"),
            lambda acc, s: acc + tl(s),
        )

    return (
        pages.select(F.col(id_col).alias("_id"), *carry_cols,
                     scored_arr.alias("_blocks"))
        .filter(F.size("_blocks") > 0)
        .withColumn("_kept", F.filter(F.col("_blocks"), good))
        .select(
            F.col("_id").alias(id_col),
            F.array_join(
                F.transform(F.col("_kept"), lambda s: s["text"]), "\n"
            ).alias("main_text"),
            F.size("_blocks").cast("long").alias("n_blocks"),
            F.size("_kept").cast("long").alias("n_good"),
            char_sum("_blocks").alias("total_chars"),
            char_sum("_kept").alias("kept_chars"),
            *carry_cols,
        )
    )
