"""Sitemap ingestion (crawl tier): raw sitemap.xml bodies → seed URLs.

Web-scale frontier bootstrapping reads sitemaps, not hand-written seed
lists. Extraction is JVM-side (regexp_extract_all — sitemap XML is flat
enough that a full XML parser buys nothing; the protocol forbids
nested <loc>), lastmod rides along for recrawl scheduling, and urls
run through the SAME Arrow-vectorized RFC-3986 canonicalizer the
frontier keys on, so sitemap-seeded and link-discovered URLs dedup
against each other exactly.

Handles both document kinds: <urlset> leaves yield (url, lastmod)
rows; <sitemapindex> children yield their child sitemap urls with
kind='sitemap' so the caller can fetch-and-expand another level (the
driver loop owns recursion, mirroring the crawl engine's superstep
style — no unbounded work inside one plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_scrapper_spark.functions.urltools import canonicalize_udf

# (?s): entries span lines; Java regex '.' does not cross newlines
# without DOTALL (RE2 on the oracle side accepts the same flag)
_LOC = "<loc>([^<]*)</loc>"
_URL_BLOCK = "(?s)<url>.*?</url>"
_SITEMAP_BLOCK = "(?s)<sitemap>.*?</sitemap>"
_LASTMOD = "<lastmod>([^<]*)</lastmod>"


def parse_sitemaps(bodies: DataFrame, host_col: str = "host",
                   body_col: str = "body") -> DataFrame:
    """(host, body) → (host, kind, url, lastmod): kind='page' for
    <urlset> entries, kind='sitemap' for <sitemapindex> children.
    lastmod is the raw string (empty when absent) — parsing it to a
    timestamp is recrawl policy, not ingestion."""
    # block-wise extraction keeps each <loc> paired with ITS <lastmod>
    # (flat regexes over the whole body would misalign them when some
    # entries omit lastmod)
    page_blocks = F.regexp_extract_all(F.col(body_col), F.lit(_URL_BLOCK), 0)
    sm_blocks = F.regexp_extract_all(F.col(body_col), F.lit(_SITEMAP_BLOCK), 0)
    blocks = bodies.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.concat(
                F.transform(page_blocks, lambda b: F.struct(
                    F.lit("page").alias("kind"), b.alias("block"))),
                F.transform(sm_blocks, lambda b: F.struct(
                    F.lit("sitemap").alias("kind"), b.alias("block"))),
            )
        ).alias("e"),
    ).select("host", F.col("e.kind").alias("kind"), F.col("e.block").alias("block"))
    # <loc> values are XML-escaped (sitemap.org requires entity-escaping
    # urls with & etc.) — unescape the five XML entities, &amp; LAST so
    # double-escapes resolve one level per pass, before canonicalizing
    raw = F.regexp_extract("block", _LOC, 1)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        raw = F.replace(raw, F.lit(ent), F.lit(ch))
    return blocks.select(
        "host",
        "kind",
        raw.alias("raw_url"),
        F.regexp_extract("block", _LASTMOD, 1).alias("lastmod"),
    ).filter(F.col("raw_url") != "").select(
        "host", "kind",
        canonicalize_udf(F.col("raw_url")).alias("url"),
        "lastmod",
    )


def sitemap_seed_frontier(bodies: DataFrame) -> DataFrame:
    """Page entries only, deduped on canonical url (first host wins
    deterministically) — the frame a crawl run unions into its seed
    list."""
    pages = parse_sitemaps(bodies).filter(F.col("kind") == "page")
    return (
        pages.groupBy("url")
        .agg(F.min("host").alias("host"), F.max("lastmod").alias("lastmod"))
        .select("url", "host", "lastmod")
    )
