"""Selector-engine unit tests (the goquery subset the reference uses)."""

from go_scrapper_spark.functions.htmlmini import (
    child_attr,
    child_text,
    child_texts,
    parse_html,
    select,
)

DOC = """
<html><head>
<meta name="yelp-biz-id" content="bid-1">
<script type="application/ld+json">{"reviewCount":12}</script>
<script type="application/json">{"hovercardData":{}}</script>
</head><body>
<h3>5 reviews that are not currently recommended</h3>
<div class="not-recommended-reviews"><ul class="reviews">
  <li><div class="review--with-sidebar" data-review-id="N1">
    <div class="review-sidebar"><a class="user-display-name" href="/u?'userid=U1">Ann &amp; Co</a></div>
    <div class="review-wrapper"><div class="review-content"><p>Nice &amp; good</p>
      <span class="rating-qualifier">1/2/2020 via web</span></div>
      <div class="biz-rating"><i class="i-stars regular-4"></i></div>
    </div>
  </div></li>
  <li><div class="review--with-sidebar" data-review-id="N2"></div></li>
</ul></div>
<ul class="reviews"><li>decoy (not under the right parent)</li></ul>
</body></html>
"""


def test_attr_selector():
    dom = parse_html(DOC)
    assert child_attr(dom, 'meta[name="yelp-biz-id"]', "content") == "bid-1"


def test_typed_script_selector():
    dom = parse_html(DOC)
    assert child_text(dom, 'script[type="application/ld+json"]') == '{"reviewCount":12}'


def test_contains_pseudo():
    dom = parse_html(DOC)
    texts = child_texts(dom, "script:contains(hovercardData)")
    assert texts == ['{"hovercardData":{}}']


def test_direct_child_combinator():
    dom = parse_html(DOC)
    lis = select(dom, "div.not-recommended-reviews > ul.reviews > li")
    assert len(lis) == 2  # the decoy ul is excluded


def test_descendant_and_class():
    dom = parse_html(DOC)
    lis = select(dom, "div.not-recommended-reviews > ul.reviews > li")
    assert child_attr(lis[0], "div.review-sidebar .user-display-name", "href") == "/u?'userid=U1"
    assert child_text(lis[0], "div.review-wrapper div.review-content p") == "Nice &amp; good"
    assert child_attr(lis[0], ".biz-rating .i-stars", "class") == "i-stars regular-4"
    assert child_attr(lis[0], "div.review--with-sidebar", "data-review-id") == "N1"


def test_missing_returns_empty():
    dom = parse_html(DOC)
    assert child_text(dom, "div.nope") == ""
    assert child_attr(dom, "div.nope", "x") == ""


def test_entities_kept_raw_in_dom():
    # text() keeps entities; one unescape = goquery-decoded text
    dom = parse_html("<p>A &amp;amp; B</p>")
    assert select(dom, "p")[0].text() == "A &amp;amp; B"


def test_child_text_concatenates_all_matches():
    # goquery Selection.Text() concatenates ALL matched nodes' text;
    # colly ChildText trims the concatenation (reference main.go:549
    # reads every ld+json script on the page through one ChildText)
    dom = parse_html(
        '<div><script type="x">{"a":1}</script>'
        '<p>skip</p><script type="x">{"b":2}</script></div>'
    )
    assert child_text(dom, 'script[type="x"]') == '{"a":1}{"b":2}'


def test_fast_parser_matches_stdlib_builder():
    """parse_html (fast tokenizer) must produce the identical tree to
    parse_html_stdlib (the behavioral spec) on representative and
    adversarial markup."""
    from go_scrapper_spark.functions.htmlmini import parse_html_stdlib

    docs = [
        DOC,
        "<p>A &amp;amp; B</p>",
        '<div><script type="x">{"a":1,"lt":"<p>not a tag</p>"}</script>'
        "<p>skip</p><script type=\"x\">{\"b\":2}</script></div>",
        "<ul><li>one<li>two</ul>",                       # unclosed li
        "<img src=\"x.png\"><br/><input disabled>",      # void + valueless
        "<!-- c --><!doctype html><?pi ?><b>t</b>",
        "<a href=\"/u?a=1&amp;b=2\">x</a>",              # entity in attr
        "<A HREF=\"X\"><B>y</B></A>",                    # case folding
        "<style>p > .x { color: red }</style><p>q</p>",  # CDATA style
        "<div class=\"a b\"><span class=\"a\">s</span></div>",
        "text only, no tags",
        "<p>unterminated",
        "a < b but <em>fine</em>",                       # stray <
        "<script>var x = 1;</script",                    # truncated close
        "<td nowrap>cell</td>",
    ]

    def dump(n):
        # adjacent text chunks merge: stdlib emits one data event per
        # entity boundary while the fast path appends raw slices — the
        # concatenation (what text() reads) is the semantic content
        if isinstance(n, str):
            return ("T", n)
        kids, buf = [], []
        for c in n.children:
            if isinstance(c, str):
                buf.append(c)
            else:
                if buf:
                    kids.append(("T", "".join(buf))); buf = []
                kids.append(dump(c))
        if buf:
            kids.append(("T", "".join(buf)))
        return ("N", n.tag, sorted(n.attrs.items(), key=str), kids)

    for doc in docs:
        assert dump(parse_html(doc)) == dump(parse_html_stdlib(doc)), doc
