"""Minimal DOM + CSS-selector engine on stdlib ``html.parser``.

lxml/selectolax are not installed in this environment; the extraction
UDFs (SURVEY.md P1, P5-P7) need goquery-style selector queries over
page HTML. This implements exactly the selector subset the reference
uses (reference main.go:355-931): tag, ``.class``, ``tag.class``,
``[attr="val"]``, ``:contains(text)``, descendant (space) and direct
child (``>``) combinators.

Pure Python, no Spark imports — runs inside Arrow-batched pandas UDFs
and in the pure-Python reference model. When lxml/selectolax are
available in a production image, ``extract.py`` can swap the backend;
the selector semantics here are the contract.
"""

from __future__ import annotations

import re
from functools import lru_cache
from html.parser import HTMLParser

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = (
        "tag", "attrs", "children", "parent",
        "_text", "_desc", "_by_tag", "_by_class", "_classes",
    )

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []  # Node or str
        self.parent = parent
        self._text = None
        self._desc = None
        self._by_tag = None
        self._by_class = None
        self._classes = None

    @property
    def classes(self) -> set[str]:
        if self._classes is None:
            self._classes = set((self.attrs.get("class") or "").split())
        return self._classes

    def text(self) -> str:
        """All descendant text concatenated (goquery .Text() semantics)."""
        if self._text is None:
            out: list[str] = []
            stack: list[object] = list(reversed(self.children))
            while stack:
                n = stack.pop()
                if isinstance(n, str):
                    out.append(n)
                else:
                    stack.extend(reversed(n.children))
            self._text = "".join(out)
        return self._text

    def iter_desc(self):
        """All descendant element nodes, document order. Materialized
        once per node (extraction runs dozens of selectors against the
        same subtrees; the repeated stack walk was the profiled hot
        path of the whole crawl's Python plane). Caches are only valid
        once parsing is done — parse_html returns a finished tree."""
        if self._desc is None:
            out: list[Node] = []
            stack: list[Node] = [
                c for c in reversed(self.children) if isinstance(c, Node)
            ]
            while stack:
                n = stack.pop()
                out.append(n)
                stack.extend(c for c in reversed(n.children) if isinstance(c, Node))
            self._desc = out
        return self._desc

    def desc_by_tag(self, tag: str) -> list["Node"]:
        """Descendants of one tag, document order — the candidate set
        for tagged selectors (most of the reference's selector set), so
        a `div.review` query scans review divs, not the whole DOM."""
        if self._by_tag is None:
            idx: dict[str, list[Node]] = {}
            for n in self.iter_desc():
                idx.setdefault(n.tag, []).append(n)
            self._by_tag = idx
        return self._by_tag.get(tag, [])

    def desc_by_class(self, cls: str) -> list["Node"]:
        """Descendants carrying one class, document order — the
        candidate set for class-bearing selector parts (built once per
        queried node, like the tag index; a `.user-display-name` part
        then scans a handful of nodes instead of the whole subtree)."""
        if self._by_class is None:
            idx: dict[str, list[Node]] = {}
            for n in self.iter_desc():
                for c in n.classes:
                    idx.setdefault(c, []).append(n)
            self._by_class = idx
        return self._by_class.get(cls, [])


class _Builder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=False)  # keep entities raw in text
        self.root = Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # walk up to the matching open tag (tolerant of mis-nesting)
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)

    def handle_entityref(self, name):
        self.cur.children.append(f"&{name};")

    def handle_charref(self, name):
        self.cur.children.append(f"&#{name};")


def parse_html_stdlib(html: str) -> Node:
    """Reference tree builder on stdlib html.parser — the behavioral
    spec for ``parse_html`` below (kept for the differential test and
    as a fallback for markup the fast tokenizer declines)."""
    b = _Builder()
    b.feed(html)
    return b.root


# Fast tokenizer (round 7, guide §4.2 "per-task work"): stdlib
# HTMLParser spent ~40% of the extraction plane's CPU in
# goahead/parse_starttag/updatepos bookkeeping this engine never uses
# (line numbers, charref events, tolerant re-scanning). The regex
# tokenizer below produces the IDENTICAL tree for the markup the
# engine parses — tag/attr names lowercased, attr values
# entity-unescaped, text kept raw (entity refs stay literal, exactly
# like the _Builder's handle_entityref), <script>/<style> content as
# CDATA, comments/doctype/PIs skipped, self-closing and void tags leaf
# — verified by a differential test against parse_html_stdlib and the
# extraction goldens. Start tags whose attributes the regex cannot
# carve (quoted '>' etc.) make the whole document fall back to the
# stdlib builder, so divergence is impossible on exotic markup.
_FAST_START_RE = re.compile(
    r"<([a-zA-Z][^\s/>]*)"
    r"((?:\s+[^\s/>=]+(?:=(?:\"[^\"]*\"|'[^']*'|[^\s>]*))?)*)"
    r"\s*(/?)>"
)
_FAST_ATTR_RE = re.compile(
    r"([^\s/>=]+)(?:=(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
)
_FAST_END_SCRIPT = re.compile(r"(?i)</script(?=[\s>/]|$)")
_FAST_END_STYLE = re.compile(r"(?i)</style(?=[\s>/]|$)")


def _fast_attrs(s: str) -> dict[str, str | None]:
    if not s:
        return {}
    import html as _html

    attrs: dict[str, str | None] = {}
    for m in _FAST_ATTR_RE.finditer(s):
        k = m.group(1).lower()
        v = m.group(2)
        if v is None:
            attrs[k] = None  # valueless attribute, mirroring HTMLParser
            continue
        if v and v[0] in "\"'" and v[-1] == v[0] and len(v) >= 2:
            v = v[1:-1]
        attrs[k] = _html.unescape(v) if "&" in v else v
    return attrs


def parse_html(html: str) -> Node:
    root = Node("#root", {}, None)
    cur = root
    n = len(html)
    i = 0
    find = html.find
    while i < n:
        lt = find("<", i)
        if lt < 0:
            if i < n:
                cur.children.append(html[i:])
            break
        if lt > i:
            cur.children.append(html[i:lt])
        c = html[lt + 1] if lt + 1 < n else ""
        if c == "/":
            gt = find(">", lt + 2)
            if gt < 0:
                break
            tag = html[lt + 2:gt].strip().lower()
            node = cur
            while node is not None and node.tag != tag:
                node = node.parent
            if node is not None and node.parent is not None:
                cur = node.parent
            i = gt + 1
        elif c == "!":
            if html.startswith("<!--", lt):
                end = find("-->", lt + 4)
                i = (end + 3) if end >= 0 else n
            else:
                gt = find(">", lt + 2)
                i = (gt + 1) if gt >= 0 else n
        elif c == "?":
            gt = find(">", lt + 2)
            i = (gt + 1) if gt >= 0 else n
        else:
            m = _FAST_START_RE.match(html, lt)
            if m is None:
                if c and (c.isalpha()):
                    # start-tag-shaped but unparseable (quoted '>' in an
                    # attribute, unterminated tag): use the spec builder
                    return parse_html_stdlib(html)
                # stray '<' is text, like HTMLParser's tolerant path
                cur.children.append("<")
                i = lt + 1
                continue
            tag = m.group(1).lower()
            node = Node(tag, _fast_attrs(m.group(2)), cur)
            cur.children.append(node)
            i = m.end()
            if m.group(3) == "/" or tag in _VOID_TAGS:
                pass  # leaf
            elif tag == "script" or tag == "style":
                # CDATA content: raw text until the matching close tag
                endre = _FAST_END_SCRIPT if tag == "script" else _FAST_END_STYLE
                em = endre.search(html, i)
                gt = find(">", em.start()) if em is not None else -1
                if em is None or gt < 0:
                    # no COMPLETE close tag: stdlib's CDATA scanner
                    # buffers (and at EOF drops) the trailing content
                    i = n
                else:
                    if em.start() > i:
                        node.children.append(html[i:em.start()])
                    i = gt + 1
            else:
                cur = node
    return root


# --- selector engine --------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*)?"
    r"(?P<classes>(?:\.[\w-]+)*)"
    r"(?P<attr>\[[\w-]+=\"[^\"]*\"\])?"
    r"(?P<contains>:contains\([^)]*\))?"
)


class _Simple:
    __slots__ = ("tag", "classes", "attr_k", "attr_v", "contains",
                 "first_class")

    def __init__(self, token: str):
        m = _SIMPLE_RE.fullmatch(token)
        if not m:
            raise ValueError(f"unsupported selector token: {token!r}")
        self.tag = m.group("tag")
        self.classes = set(c for c in (m.group("classes") or "").split(".") if c)
        self.attr_k = self.attr_v = None
        if m.group("attr"):
            k, v = m.group("attr")[1:-1].split("=", 1)
            self.attr_k, self.attr_v = k, v.strip('"')
        self.contains = None
        if m.group("contains"):
            self.contains = m.group("contains")[len(":contains("):-1]
        # candidate-index pick for select(): any class is usually more
        # selective than a tag (pages carry many divs, few of a class)
        self.first_class = next(iter(self.classes)) if self.classes else None

    def match(self, n: Node) -> bool:
        if self.tag and n.tag != self.tag:
            return False
        if self.classes and not self.classes <= n.classes:
            return False
        if self.attr_k is not None and n.attrs.get(self.attr_k) != self.attr_v:
            return False
        if self.contains is not None and self.contains not in n.text():
            return False
        return True


@lru_cache(maxsize=512)
def _compile(selector: str) -> tuple[tuple[str, _Simple], ...]:
    """Compile into ((combinator, simple), ...) where combinator ∈
    {desc, child}. Cached: the extraction pass runs the same ~20
    selectors against every page, and _Simple construction was ~10% of
    select() time. _Simple is immutable after construction."""
    tokens = selector.replace(">", " > ").split()
    out: list[tuple[str, _Simple]] = []
    comb = "desc"
    for tok in tokens:
        if tok == ">":
            comb = "child"
            continue
        out.append((comb, _Simple(tok)))
        comb = "desc"
    return tuple(out)


def select(root: Node, selector: str) -> list[Node]:
    """All descendant nodes of ``root`` matching ``selector``, doc order."""
    parts = _compile(selector)
    current = [root]
    for pi, (comb, simple) in enumerate(parts):
        nxt: list[Node] = []
        # one base yields unique nodes already — the dedup set only
        # matters when overlapping subtrees can emit a node twice
        seen: set[int] | None = set() if len(current) > 1 else None
        for base in current:
            if comb == "child":
                it = (c for c in base.children if isinstance(c, Node))
            elif simple.first_class is not None and (
                pi == 0 or base._by_class is not None
            ):
                # class index only where it amortizes: the first part's
                # base is the caller's root, queried by every selector
                # of the extraction pass; later parts see tiny one-off
                # bases where building an index costs more than a scan
                it = base.desc_by_class(simple.first_class)
            elif simple.tag:
                it = base.desc_by_tag(simple.tag)
            else:
                it = base.iter_desc()
            if seen is None:
                nxt.extend(n for n in it if simple.match(n))
            else:
                for n in it:
                    if id(n) not in seen and simple.match(n):
                        seen.add(id(n))
                        nxt.append(n)
        current = nxt
    return current


def child_text(root: Node, selector: str) -> str:
    """colly e.ChildText = TrimSpace(goquery Find(sel).Text()):
    goquery Selection.Text() concatenates the text of ALL matched
    nodes, then colly trims — so a page with e.g. multiple ld+json
    scripts yields their concatenation, not just the first."""
    return "".join(n.text() for n in select(root, selector)).strip()


def child_texts(root: Node, selector: str) -> list[str]:
    return [n.text().strip() for n in select(root, selector)]


def child_attr(root: Node, selector: str, attr: str) -> str:
    nodes = select(root, selector)
    return nodes[0].attrs.get(attr, "") if nodes else ""
