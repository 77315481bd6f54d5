"""HTML main-content extraction (boilerplate strip).

The reference's HTML path (deepdoc/parser/html_parser.py:37-46) is:
``readability.Document(txt).title()`` + ``html_text.extract_text(
doc.summary(html_partial=True))`` → ``f"{title}\n{content}".split("\n")``.

readability-lxml / html-text / lxml are not installed in this environment,
so this module implements the same published algorithm family from scratch
on the stdlib ``html.parser``:

- Arc90-readability content scoring: paragraph-level points from text
  length and comma count, propagated to parent (100%) and grandparent (50%);
  tag-based base scores; class/id weight via the classic *unlikely* /
  *positive* / *negative* regexes; final score scaled by (1 - link density).
- html_text-style rendering: block-level elements and <br> become newlines,
  inline text is whitespace-collapsed, lines are stripped.

The public surface mirrors the reference:
``parser_txt(html) -> list[str]`` returns ``title\ncontent`` split on
newlines, and ``parse_html_bytes`` adds the find_codec decode step
(html_parser.py:26-34).
"""

from __future__ import annotations

import re

# hot path: collapsed per-node subtree text runs ~20k times per document
_WS_RUN = re.compile(r"\s+")
from html import unescape
from html.parser import HTMLParser

from ragflow_spark.core.codec import decode_bytes

# ---------------------------------------------------------------- DOM-lite

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}
_DROP = {
    "script", "style", "noscript", "template", "iframe", "object", "svg",
    "canvas", "audio", "video", "head",
}
_BLOCK = {
    "address", "article", "aside", "blockquote", "details", "dialog", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "li",
    "main", "nav", "ol", "p", "pre", "section", "table", "tr", "td", "th",
    "ul", "body", "html", "caption", "thead", "tbody", "tfoot", "option",
    "select", "textarea", "button",
}

_UNLIKELY = re.compile(
    r"combx|comment|community|disqus|extra|foot|header|menu|remark|rss|"
    r"shoutbox|sidebar|sponsor|ad-break|agegate|pagination|pager|popup|"
    r"tweet|twitter|banner|breadcrumb|cookie|share|social|promo",
    re.I,
)
_MAYBE = re.compile(r"and|article|body|column|main|shadow", re.I)
_POSITIVE = re.compile(
    r"article|body|content|entry|hentry|main|page|pagination|post|text|"
    r"blog|story",
    re.I,
)
_NEGATIVE = re.compile(
    r"combx|comment|com-|contact|foot|footer|footnote|masthead|media|meta|"
    r"outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|shopping|tags|"
    r"tool|widget",
    re.I,
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "order")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None", order: int):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # Node | str
        self.parent = parent
        self.order = order

    # -- text helpers -------------------------------------------------
    def itertext(self):
        for c in self.children:
            if isinstance(c, str):
                yield c
            else:
                yield from c.itertext()

    def text(self) -> str:
        return _WS_RUN.sub(" ", "".join(self.itertext())).strip()

    def iter_nodes(self):
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter_nodes()

    def class_id(self) -> str:
        return f"{self.attrs.get('class', '')} {self.attrs.get('id', '')}"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None, 0)
        self.stack = [self.root]
        self.title_parts: list[str] = []
        self._in_title = False
        self._order = 0

    def handle_starttag(self, tag, attrs):
        if tag in _VOID:
            self.handle_startendtag(tag, attrs)
            return
        self._order += 1
        node = Node(tag, dict(attrs), self.stack[-1], self._order)
        self.stack[-1].children.append(node)
        self.stack.append(node)
        if tag == "title":
            self._in_title = True

    def handle_startendtag(self, tag, attrs):
        self._order += 1
        node = Node(tag, dict(attrs), self.stack[-1], self._order)
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        if tag == "title":
            self._in_title = False
        # pop to the nearest matching open tag; tolerate misnesting
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        if data:
            self.stack[-1].children.append(data)


def build_tree(html: str) -> tuple[Node, str]:
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass
    title = _WS_RUN.sub(" ", unescape("".join(builder.title_parts))).strip()
    return builder.root, title


# ------------------------------------------------------------- readability


def _clean(root: Node) -> None:
    """Drop non-content subtrees and unlikely candidates, in place."""

    def keep(node: Node) -> bool:
        if node.tag in _DROP:
            return False
        cid = node.class_id()
        if (
            cid.strip()
            and _UNLIKELY.search(cid)
            and not _MAYBE.search(cid)
            and node.tag not in ("body", "html", "a")
        ):
            return False
        return True

    def walk(node: Node) -> None:
        node.children = [
            c for c in node.children if isinstance(c, str) or keep(c)
        ]
        for c in node.children:
            if isinstance(c, Node):
                walk(c)

    walk(root)


_TAG_BASE_SCORE = {
    "div": 5, "article": 5, "section": 5, "main": 5,
    "pre": 3, "td": 3, "blockquote": 3,
    "address": -3, "ol": -3, "ul": -3, "dl": -3, "dd": -3, "dt": -3,
    "li": -3, "form": -3,
    "h1": -5, "h2": -5, "h3": -5, "h4": -5, "h5": -5, "h6": -5, "th": -5,
}


def _class_weight(node: Node) -> int:
    weight = 0
    cid = node.class_id()
    if _NEGATIVE.search(cid):
        weight -= 25
    if _POSITIVE.search(cid):
        weight += 25
    return weight


def _link_density(node: Node) -> float:
    total = len(node.text())
    if total == 0:
        return 0.0
    link_len = sum(
        len(n.text()) for n in node.iter_nodes() if n.tag == "a"
    )
    return min(1.0, link_len / total)


def _subtree_stats(root: Node) -> "dict[int, tuple[str, int]]":
    """One post-order pass: id(node) → (collapsed text, link text length).
    Replaces per-candidate re-walks (text() and link density were otherwise
    recomputed per paragraph — quadratic in practice)."""
    stats: dict[int, tuple[str, int]] = {}

    def walk(n: Node) -> tuple[str, int]:
        parts: list[str] = []
        link_len = 0
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                t, ll = walk(c)
                parts.append(t)
                link_len += ll
        text = _WS_RUN.sub(" ", "".join(parts)).strip()
        if n.tag == "a":
            link_len = len(text)
        stats[id(n)] = (text, link_len)
        return text, link_len

    walk(root)
    return stats


def score_candidates(root: Node) -> "dict[Node, float]":
    """Paragraph-driven candidate scoring (the Arc90 core loop)."""
    scores: dict[Node, float] = {}
    stats = _subtree_stats(root)

    def init(node: Node) -> float:
        return _TAG_BASE_SCORE.get(node.tag, 0) + _class_weight(node)

    for para in root.iter_nodes():
        if para.tag not in ("p", "td", "pre", "blockquote"):
            continue
        text = stats[id(para)][0]
        if len(text) < 25:
            continue
        points = 1.0
        points += text.count(",") + text.count("，")
        points += min(len(text) / 100.0, 3.0)
        parent = para.parent
        grand = parent.parent if parent else None
        if parent is not None:
            scores.setdefault(parent, init(parent))
            scores[parent] += points
        if grand is not None:
            scores.setdefault(grand, init(grand))
            scores[grand] += points / 2.0
    for node in scores:
        text, link_len = stats[id(node)]
        density = min(1.0, link_len / len(text)) if text else 0.0
        scores[node] *= 1.0 - density
    return scores


def best_candidate(root: Node) -> Node | None:
    scores = score_candidates(root)
    if not scores:
        return None
    # deterministic: max score, ties broken by document order
    return max(scores.items(), key=lambda kv: (kv[1], -kv[0].order))[0]


# ------------------------------------------------------------ text render


def render_text(node: Node) -> str:
    """html_text-style rendering: blocks/<br> are line breaks, inline text
    whitespace-collapsed, lines stripped, empties dropped."""
    pieces: list[str] = []

    def walk(n: Node) -> None:
        if n.tag in _BLOCK:
            pieces.append("\n")
        if n.tag == "br":
            pieces.append("\n")
        for c in n.children:
            if isinstance(c, str):
                pieces.append(c)
            else:
                walk(c)
        if n.tag in _BLOCK:
            pieces.append("\n")

    walk(node)
    raw = "".join(pieces)
    lines = [_WS_RUN.sub(" ", ln).strip() for ln in raw.split("\n")]
    return "\n".join(ln for ln in lines if ln)


# ---------------------------------------------------------------- surface


def extract(html: str) -> tuple[str, str]:
    """Return (title, main_content_text)."""
    root, title = build_tree(html)
    _clean(root)
    candidate = best_candidate(root)
    if candidate is None:
        # fall back to whole-document text (readability's body fallback)
        return title, render_text(root)
    # include high-scoring siblings? The classic algorithm appends siblings
    # above a threshold; the dominant-candidate subtree covers our corpus
    # and keeps the result deterministic.
    return title, render_text(candidate)


def parser_txt(txt: str) -> list[str]:
    """Mirror of RAGFlowHtmlParser.parser_txt (html_parser.py:37-46)."""
    if not isinstance(txt, str):
        raise TypeError("txt type should be str!")
    title, content = extract(txt)
    return f"{title}\n{content}".split("\n")


def parse_html_bytes(blob: bytes) -> list[str]:
    """Mirror of RAGFlowHtmlParser.__call__ with binary input
    (html_parser.py:27-34): find_codec → decode(ignore) → parser_txt."""
    return parser_txt(decode_bytes(blob))
