"""Sitemap ingestion (functions/sitemap.py): <urlset> page entries,
<sitemapindex> children, per-block lastmod pairing, canonicalization,
and the seed-frontier dedup."""

from __future__ import annotations

from go_scrapper_spark.functions.sitemap import parse_sitemaps, sitemap_seed_frontier

URLSET = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://h1.example/a</loc>
    <lastmod>2024-02-01</lastmod>
  </url>
  <url><loc>HTTPS://H1.Example:443/b?z=2&amp;a=1</loc></url>
  <url><lastmod>2030-01-01</lastmod></url>
</urlset>
"""

INDEX = """<sitemapindex>
  <sitemap>
    <loc>https://h2.example/sitemaps/part1.xml</loc>
    <lastmod>2024-03-01</lastmod>
  </sitemap>
  <sitemap><loc>https://h2.example/sitemaps/part2.xml</loc></sitemap>
</sitemapindex>
"""


def test_urlset_entries_with_per_block_lastmod(spark):
    df = spark.createDataFrame([("h1.example", URLSET)], "host string, body string")
    rows = sorted(
        (r["kind"], r["url"], r["lastmod"]) for r in parse_sitemaps(df).collect()
    )
    # the loc-less third block is dropped; its lastmod must NOT leak
    # onto another entry (block-wise pairing)
    assert rows == [
        ("page", "https://h1.example/a", "2024-02-01"),
        # canonicalized: host lowercased, :443 stripped, query sorted
        ("page", "https://h1.example/b?a=1&z=2", ""),
    ]


def test_sitemapindex_children(spark):
    df = spark.createDataFrame([("h2.example", INDEX)], "host string, body string")
    rows = sorted(
        (r["kind"], r["url"], r["lastmod"]) for r in parse_sitemaps(df).collect()
    )
    assert rows == [
        ("sitemap", "https://h2.example/sitemaps/part1.xml", "2024-03-01"),
        ("sitemap", "https://h2.example/sitemaps/part2.xml", ""),
    ]


def test_seed_frontier_dedups_on_canonical_url(spark):
    # the same page listed by two hosts' sitemaps (canonically equal
    # after case/port normalization) seeds the frontier exactly once
    a = "<urlset><url><loc>https://shared.example/p</loc></url></urlset>"
    b = "<urlset><url><loc>HTTPS://Shared.Example:443/p</loc><lastmod>2024-05-05</lastmod></url></urlset>"
    df = spark.createDataFrame(
        [("h1.example", a), ("h2.example", b)], "host string, body string"
    )
    rows = sitemap_seed_frontier(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == "https://shared.example/p"
    assert r["host"] == "h1.example"  # deterministic min-host winner
    assert r["lastmod"] == "2024-05-05"  # max lastmod survives
