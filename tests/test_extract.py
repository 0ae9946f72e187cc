"""Golden extraction fixtures (SURVEY.md §5.2-1): every page of the
synthetic web must extract byte-identically, and the reference's
parsing quirks must be reproduced exactly."""

from go_scrapper_spark.functions.extract import extract_page
from go_scrapper_spark.functions.gojson import review_hash
from go_scrapper_spark.functions.urltools import canonicalize_url
from go_scrapper_spark.sources import synthetic_web as sw

CFG = sw.WebConfig(n_biz=12)


def _pages():
    for biz in range(CFG.n_biz):
        yield from sw.pages_for_biz(CFG, biz)


def test_generated_urls_are_canonical():
    for url, *_ in _pages():
        assert canonicalize_url(url) == url


def test_pagetext_byte_identical_for_every_page():
    """The BASELINE.json per-row invariant: byte-identical extracted
    text per url, across all page types."""
    n = 0
    for url, _ts, body, expected_text, _lang in _pages():
        rows = extract_page(url, body, 0, 0)
        pt = [r for r in rows if r["kind"] == "pagetext"]
        assert len(pt) == 1, url
        assert pt[0]["text"] == expected_text, url
        n += 1
    assert n > 40


def test_profile_meta_and_fanout():
    biz = 1
    url = sw.profile_url(CFG, biz)
    body = sw.profile_page_html(CFG, biz)[0].encode()
    rows = extract_page(url, body, 0, 0)
    meta = next(r for r in rows if r["kind"] == "pagemeta")
    assert meta["business_id"] == sw.business_id(CFG, biz)
    assert meta["review_count"] == sw.review_count(CFG, biz)
    feeds = [r for r in rows if r["kind"] == "outlink" and "/review_feed?" in r["out_url"]]
    # G1: one feed page per 10 reviews (main.go:572-576)
    assert len(feeds) == (sw.review_count(CFG, biz) + 9) // 10
    assert feeds[0]["out_url"] == sw.feed_url(CFG, biz, 0)
    nonrec = [r for r in rows if r["kind"] == "outlink" and "/not_recommended_reviews/" in r["out_url"]]
    assert nonrec[0]["out_url"] == sw.nonrec_root_url(CFG, biz)
    # non-rec root is issued after all feed pages (issue order, main.go:584)
    assert all(nonrec[0]["out_seq"] > f["out_seq"] for f in feeds)


def test_nonrec_root_fanout_step_10():
    biz = 1
    url = sw.nonrec_root_url(CFG, biz)
    body = sw.nonrec_root_html(CFG, biz)[0].encode()
    rows = extract_page(url, body, 1, 500)
    links = [r for r in rows if r["kind"] == "outlink"]
    nc = sw.nonrec_count(CFG, biz)
    assert [r["out_url"] for r in links] == [
        sw.nonrec_page_url(CFG, biz, i) for i in range(0, nc, 10)
    ]


def test_feed_reviews_match_generator():
    biz = 1
    url = sw.feed_url(CFG, biz, 0)
    body = sw.feed_page_json(CFG, biz, 0)[0].encode()
    revs = [r for r in extract_page(url, body, 0, 0) if r["kind"] == "review"]
    exp = sw.make_review(CFG, biz, 0)
    got = next(r for r in revs if r["review_id"] == exp["review_id"])
    assert got["text"] == exp["text"]  # unescaped display text
    assert got["author_name"] == exp["author_name"]
    assert got["rating"] == exp["rating"]
    assert got["source_date"] == exp["source_date"]
    assert (got["photos"] or []) == exp["photos"]
    if exp["owner_reply"]:
        assert got["responses"][0]["text"] == exp["owner_reply"]["text"]
        # hash branch: text+author+first-response (main.go:1017-1021)
        assert got["review_hash"] == review_hash(
            exp["text"], exp["author_name"], exp["owner_reply"]["text"], None
        )


def test_feed_previous_review_before_parent():
    """previousReviews rows are emitted before their parent and carry
    parent_id (main.go:704-736)."""
    biz = 1
    url = sw.feed_url(CFG, biz, 0)
    body = sw.feed_page_json(CFG, biz, 0)[0].encode()
    revs = [r for r in extract_page(url, body, 0, 0) if r["kind"] == "review"]
    prev = [r for r in revs if r["parent_id"]]
    assert prev, "fixture must include previous reviews"
    for p in prev:
        parent_pos = next(
            i for i, r in enumerate(revs) if r["review_id"] == p["parent_id"]
        )
        assert revs.index(p) < parent_pos


def test_nonrec_author_id_keeps_userid_prefix():
    """Go quirk: FindStringSubmatch()[0] keeps the 'userid= prefix
    (main.go:840-842)."""
    biz = 1
    url = sw.nonrec_page_url(CFG, biz, 0)
    body = sw.nonrec_page_html(CFG, biz, 0)[0].encode()
    revs = [r for r in extract_page(url, body, 0, 0) if r["kind"] == "review"]
    assert all(r["author_id"].startswith("'userid=") for r in revs)


def test_nonrec_trailing_text_fallback():
    """Previous-review trailing-text fallback (main.go:908-913)."""
    found = False
    for biz in range(CFG.n_biz):
        nc = sw.nonrec_count(CFG, biz)
        for start in range(0, nc, 10):
            for i in range(start, min(start + 10, nc)):
                r = sw.make_review(CFG, biz, i, non_rec=True)
                if r["previous"] and r["previous"]["fallback_text"]:
                    url = sw.nonrec_page_url(CFG, biz, start)
                    body = sw.nonrec_page_html(CFG, biz, start)[0].encode()
                    revs = [
                        x for x in extract_page(url, body, 0, 0)
                        if x["kind"] == "review" and x["parent_id"] == r["review_id"]
                    ]
                    assert revs and revs[0]["text"] == r["previous"]["text"]
                    found = True
    assert found, "fixtures must exercise the fallback path"


def test_nonrec_previous_photos_always_empty():
    """Go quirk: previous-review photos use ChildText on <img> → always
    empty (main.go:903-906)."""
    for biz in range(CFG.n_biz):
        nc = sw.nonrec_count(CFG, biz)
        for start in range(0, nc, 10):
            url = sw.nonrec_page_url(CFG, biz, start)
            body = sw.nonrec_page_html(CFG, biz, start)[0].encode()
            for r in extract_page(url, body, 0, 0):
                if r["kind"] == "review" and r["parent_id"]:
                    assert r["photos"] is None
