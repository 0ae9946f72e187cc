"""Unit tests for main-content extraction (boilerplate removal).

Cross-engine value-exactness is enforced by the `extract_main_content`
DuckDB oracle; these pin the block/density semantics on hand-built
pages with known answers."""

import pytest

from go_scrapper_spark.functions.boilerplate import extract_main_content

ARTICLE = (
    "<html><head><title>T</title><style>p{color:red}</style>"
    '<script>var x="<p>fake</p>";</script></head><body>'
    '<NAV><a href="/">Home</a> | <a href="/about">About our company</a>'
    ' | <a href="/contact">Contact</a></NAV>'
    "<h1>The actual article headline here</h1>"
    "<p>This is the real article body with enough characters to pass the"
    " minimum length threshold and almost no links at all.</p>"
    "<p>Second paragraph, also long enough to be kept by the density"
    ' filter, with one <a href="/ref">small link</a> inside prose.</p>'
    '<div class="ads"><a href="/buy">BUY NOW the amazing product click'
    " here today</a></div>"
    "<footer>(c) 2026 corp</footer>"
    "<!-- <p>commented out, long enough to pass the length filter too"
    " if comments leaked through the subtree strip</p> --></body></html>"
)


def _run(spark, html, **kw):
    df = spark.createDataFrame([("u1", html)], "url string, html string")
    rows = extract_main_content(df, **kw).collect()
    return rows[0] if rows else None


def test_article_kept_chrome_dropped(spark):
    r = _run(spark, ARTICLE)
    lines = r["main_text"].split("\n")
    assert lines[0] == "The actual article headline here"
    assert len(lines) == 3 and r["n_good"] == 3
    for bad in ("Home", "BUY NOW", "corp", "commented out", "color:red",
                "var x"):
        assert bad not in r["main_text"]
    assert r["kept_chars"] < r["total_chars"]


def test_case_insensitive_tags_and_br_split(spark):
    # uppercase block tags split; <br> separates blocks so the short
    # fragments fail the length filter independently
    r = _run(spark, "<P>this paragraph is long enough to be kept as"
                    " content</P>short bit<BR/>tiny")
    assert r["main_text"] == ("this paragraph is long enough to be kept"
                              " as content")
    assert r["n_blocks"] == 3 and r["n_good"] == 1


def test_link_density_integer_boundary(spark):
    # visible text 30 chars (19 + injected space + 10 anchor chars),
    # anchor mass 10 → 10*100 <= 33*30 = 990 is False at pct=33
    # (1000 > 990), True at pct=34
    body = "<p>" + "x" * 19 + '<a href="/l">' + "y" * 10 + "</a>" + "</p>"
    r = _run(spark, body)
    assert (r["n_good"], r["main_text"]) == (0, "")
    r = _run(spark, body, max_link_density_pct=34)
    assert r["n_good"] == 1


def test_no_qualifying_blocks_keeps_page_with_metrics(spark):
    # zero-yield pages stay in the output (corpus accounting needs the
    # denominator), with empty main_text
    r = _run(spark, "<nav><a href='/'>home page link</a></nav>")
    assert (r["main_text"], r["n_good"]) == ("", 0)
    assert r["total_chars"] > 0 and r["kept_chars"] == 0


def test_nested_tags_inside_anchor_counted_once(spark):
    # anchor text mass uses the tag-stripped inner text (the <b> must
    # not shield characters from the density count)
    body = ("<p>plain words here to reach the length threshold easily"
            ' <a href="/x"><b>bold link text that dominates the block'
            " completely and then some more</b></a></p>")
    r = _run(spark, body)
    assert r is not None and r["n_good"] == 0
