"""HTML main-content extraction (boilerplate strip).

The reference's HTML path (deepdoc/parser/html_parser.py:26-46) is::

    html_doc = readability.Document(txt)
    title = html_doc.title()
    content = html_text.extract_text(html_doc.summary(html_partial=True))
    return f"{title}\\n{content}".split("\\n")

readability-lxml 0.8.1 / html-text / lxml are not installed in this
environment (nor obtainable — no network), so this module is a faithful
RE-IMPLEMENTATION of both published algorithms from their public sources,
over a stdlib ``html.parser`` DOM:

- ``Document.summary()``: the ruthless/retry loop, unlikely-candidate
  removal (class+id vs the classic regex banks), div→p transformation
  (``divToPElementsRe`` over the serialized children), paragraph scoring
  (content_score = 1 + commas+1 + min(len/100, 3) onto parent and
  grandparent/2, seeded by ``score_node`` tag weights and ±25 class/id
  weights), link-density scaling, ``select_best_candidate`` (stable sort,
  insertion order breaks ties), sibling joining in ``get_article``
  (threshold max(10, best*0.2), the <p> length-80/density-0.25 rules) and
  the full ``sanitize`` conditional cleaner (header/form/textarea/iframe
  drops, the comma<10 counts table for table/ul/div/aside, the
  1000-char-sibling allowance) — readability/readability.py @0.8.1.
- ``Document.title()`` → ``get_title`` (``"[no-title]"`` default,
  ``normalize_spaces`` + ``normalize_entities``) — readability/htmls.py.
- ``html_text.extract_text``: ``etree_to_text`` with NEWLINE_TAGS /
  DOUBLE_NEWLINE_TAGS, punctuation-aware space guessing
  (``_has_punct_after`` / ``_has_open_bracket_before``) and the
  cleaner config that keeps frames/forms/embedded — html_text 0.5.x.

Known divergence classes (each pinned by tests/test_html_readability.py;
everything else follows the published arithmetic exactly):

1. PARSER-RECOVERY: stdlib html.parser vs libxml2 recovery on misnested
   markup. NARROWED (r7): the tree builder now applies libxml2's
   ``htmlStartClose`` implied-end-tag recovery (unclosed ``p``/``li``/
   ``tr``/``td``/``th``/``dt``/``dd``/``option``, block-closes-p,
   a-closes-a — see ``_START_CLOSE``), and stray end tags were already
   dropped, so the dominant real-world misnesting shapes now produce
   libxml2-identical trees (pinned in tests/test_html_readability.py
   "recovered" section). NARROWED AGAIN (r7b): the legacy autoclose
   entries are now transcribed too — ``center`` closes ``font/b/i/p``,
   new ``td``/``th``/``tr`` close open inline formatting
   (``p/span/font/a/b/i/u``), and the ``menu``/``dir``/``listing``/
   ``xmp`` quirk closers are threaded through the block entries.
   NARROWED AGAIN (r7b, second pass): the end-tag path now applies
   libxml2's ``htmlEndPriority`` rule — a mismatched end tag only
   auto-closes lower-priority open elements, so ``<b>a<div>b</b>``
   keeps ``b`` open (the stray ``</b>`` is ignored) while ``</td>`` /
   ``</table>`` still force-close open inline runs. NARROWED AGAIN
   (r7c): the implied-skeleton machinery is now ported too —
   ``htmlCheckImplied`` (auto-inserted html/head/body, the
   ctxt->html 3/10 once-only state), ``htmlCheckParagraph`` (stray
   character data at document/html/head level wrapped in an implied
   ``<p>``), the misplaced html/head/body start-tag discards with
   libxml2's ctxt->depth end-tag swallowing, and areBlanks' ignorable
   whitespace in skeleton contexts. Residual divergence: exotic
   post-</body> content placement (we normalize to one body where the
   C code can emit sibling bodies on malformed input — documented in
   ``_TreeBuilder.__init__``) and areBlanks' not-before-a-tag corner.
2. SERIALIZE-REPARSE: the reference serializes the article and re-parses
   it in html_text (dropping attrs via clean_attributes); we hand the
   tree over directly. Text-identical unless re-parsing restructures
   invalid fragments (e.g. <td> appended directly under the article div).
3. ENCODING: Document gets a str here (decode happens in find_codec
   upstream, as in the reference), so lxml's encoding re-detection branch
   never runs on either side.
"""

from __future__ import annotations

import re

from ragflow_spark.core.codec import decode_bytes

# hot path: collapsed per-node subtree text runs ~20k times per document
_WS_RUN = re.compile(r"\s+")

from html import escape
from html.parser import HTMLParser

# --------------------------------------------------------------- regexes
# readability/readability.py REGEXES @0.8.1 — byte-for-byte

REGEXES = {
    "unlikelyCandidatesRe": re.compile(
        r"combx|comment|community|disqus|extra|foot|header|menu|remark|rss|"
        r"shoutbox|sidebar|sponsor|ad-break|agegate|pagination|pager|popup|"
        r"tweet|twitter",
        re.I,
    ),
    "okMaybeItsACandidateRe": re.compile(
        r"and|article|body|column|main|shadow", re.I),
    "positiveRe": re.compile(
        r"article|body|content|entry|hentry|main|page|pagination|post|text|"
        r"blog|story",
        re.I,
    ),
    "negativeRe": re.compile(
        r"combx|comment|com-|contact|foot|footer|footnote|masthead|media|"
        r"meta|outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|"
        r"shopping|tags|tool|widget",
        re.I,
    ),
    "divToPElementsRe": re.compile(
        r"<(a|blockquote|dl|div|img|ol|p|pre|table|ul)", re.I),
    "videoRe": re.compile(r"https?:\/\/(www\.)?(youtube|vimeo)\.com", re.I),
}

MIN_TEXT_LENGTH = 25   # Document default min_text_length
RETRY_LENGTH = 250     # Document default retry_length

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}
# libxml2 IS_BLANK_CH (parserInternals.h): 0x20, 0x09, 0x0A, 0x0D only.
# Python's str.strip() also removes every Unicode space (U+00A0, U+2009,
# thin/em spaces, …) — lxml KEEPS those as text nodes, so blank-dropping
# with the default strip() glued words across &nbsp;-only runs (r7 fuzz
# finding). areBlanks decisions must use exactly this set.
_XML_BLANKS = " \t\n\r"
# readability's parse-time cleaner (htmls.py html_cleaner): scripts,
# style, comments (parser drops them), links=True → <link> killed. Other
# embedded/frames/forms are KEPT for scoring.
_PARSE_DROP = {"script", "style", "link"}
# html.parser treats these as CDATA — their raw content must never leak
# into text
_CDATA = {"script", "style"}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "order")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None",
                 order: int):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # Node | str (strings = text runs)
        self.parent = parent
        self.order = order

    # -- lxml-equivalent accessors ------------------------------------
    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def set(self, key: str, value: str) -> None:
        self.attrs[key] = value

    @property
    def text(self) -> "str | None":
        """lxml ``.text``: the text run before the first element child."""
        if self.children and isinstance(self.children[0], str):
            return self.children[0]
        return None

    def itertext(self):
        # iterative: called ~500x/doc via text_content in the scoring loop
        stack = list(self.children)
        stack.reverse()
        while stack:
            c = stack.pop()
            if type(c) is str:
                yield c
            else:
                ch = c.children
                if ch:
                    stack.extend(ch[::-1])

    def text_content(self) -> str:
        return "".join(self.itertext())

    def iter_nodes(self):
        # iterative preorder: the recursive generator chain was the
        # hottest call site in the 1M-doc smoke profile
        stack = [self]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(
                c for c in reversed(n.children) if isinstance(c, Node))

    def findall(self, tag: str) -> "list[Node]":
        """``.//tag`` — descendants in document order, self excluded."""
        out = self.findall_multi((tag,))[tag]
        return out

    def findall_multi(self, tags) -> "dict[str, list[Node]]":
        """One preorder walk collecting every tag in ``tags`` — the
        1M-doc smoke profile showed repeated full-tree findall walks
        (one per tag name) dominating the HTML path. Text runs are
        filtered at pop with a single type check."""
        buckets: dict = {t: [] for t in tags}
        stack = list(self.children)
        stack.reverse()
        while stack:
            n = stack.pop()
            if type(n) is str:
                continue
            b = buckets.get(n.tag)
            if b is not None:
                b.append(n)
            ch = n.children
            if ch:
                if len(ch) == 1:
                    stack.append(ch[0])
                else:
                    stack.extend(ch[::-1])
        return buckets

    def find_first(self, tag: str) -> "Node | None":
        for n in self.iter_nodes():
            if n is not self and n.tag == tag:
                return n
        return None

    def element_children(self) -> "list[Node]":
        return [c for c in self.children if isinstance(c, Node)]

    def itersiblings(self, preceding: bool = False):
        """Element siblings after (or before, reversed) this node."""
        if self.parent is None:
            return
        sibs = self.parent.element_children()
        i = sibs.index(self)
        if preceding:
            yield from reversed(sibs[:i])
        else:
            yield from sibs[i + 1:]

    def drop_tree(self) -> None:
        """lxml ``drop_tree``: remove the element and its subtree; the
        tail (our following sibling string) stays with the parent."""
        if self.parent is not None and self in self.parent.children:
            self.parent.children.remove(self)

    def tail_run(self) -> "str | None":
        """The text run immediately following this node in its parent
        (lxml ``.tail``)."""
        if self.parent is None:
            return None
        ch = self.parent.children
        i = ch.index(self)
        if i + 1 < len(ch) and isinstance(ch[i + 1], str):
            return ch[i + 1]
        return None


# libxml2 HTMLparser.c ``htmlStartClose`` (public source), the implied-
# end-tag recovery lxml applies before readability ever sees the tree:
# when start tag KEY arrives, the parser repeatedly auto-closes the
# CURRENT open element while it appears in KEY's set — shallow, one
# stack-top comparison per pop, exactly libxml2's htmlAutoClose loop (it
# does NOT search the stack, so ``<p>a<b>x<p>`` still nests: p doesn't
# close b). Transcribed from libxml2 HTMLparser.c htmlStartClose: the
# pairs that dominate real Common-Crawl misnesting (unclosed
# p/li/tr/td/th/dt/dd/option, block-closes-p, a-closes-a) PLUS (r7) the
# legacy entries that used to be left out: center-closes-font/b/i,
# td/th/tr closing open inline formatting (p/span/font/a/b/i/u — the
# "unclosed <a>/<b> spilling across table cells" shape), and the
# menu/dir/listing/xmp quirk closers.
_H16 = {"h1", "h2", "h3", "h4", "h5", "h6"}
# legacy list-ish/preformatted closers libxml2 threads through most
# block entries (dl/dt/dd/ul/form/li/table/fieldset)
_LEGACY = {"menu", "dir", "listing", "xmp"}
# inline formatting a new table cell/row force-closes in libxml2
_CELL_INLINE = {"p", "span", "font", "a", "b", "i", "u"}
_START_CLOSE = {
    "p": {"p", "head"} | _H16,
    "div": {"p", "head"},
    "blockquote": {"p", "head"},
    "hr": {"p", "head"},
    "pre": {"p", "head", "ul"},
    "address": {"p", "head", "ul"},
    "listing": {"p", "head"},
    "xmp": {"p", "head"},
    "dir": {"p", "head"},
    "menu": {"p", "head", "ul"},
    "center": {"font", "b", "i", "p", "head"},
    "head": {"p"},
    "title": {"p"},
    "body": {"head", "style", "link", "meta", "script", "title", "p"},
    "frameset": {"head", "style", "link", "meta", "script", "title", "p"},
    "noscript": {"p"},
    "form": {"form", "p", "hr", "dl", "ul", "ol", "address",
             "pre"} | _H16 | _LEGACY,
    "li": {"li", "p", "dl", "address", "pre", "listing", "xmp",
           "head"} | _H16,
    "ul": {"p", "head", "ol", "address", "pre"} | _LEGACY,
    "ol": {"p", "head", "ul"},
    "dl": {"p", "dt", "address", "pre", "head"} | _LEGACY,
    "dt": {"dd", "dt", "p", "address", "pre", "head"} | _LEGACY,
    "dd": {"dt", "dd", "p", "address", "pre", "head"} | _LEGACY,
    "table": {"p", "head", "pre", "listing", "xmp", "a"} | _H16,
    "caption": {"p"},
    "colgroup": {"caption", "legend", "tr", "col", "colgroup"},
    "col": {"caption", "col", "colgroup", "legend"},
    "tr": {"tr", "td", "th", "caption", "col", "colgroup"} | _CELL_INLINE,
    "td": {"td", "th", "caption", "col", "colgroup"} | _CELL_INLINE,
    "th": {"td", "th", "caption", "col", "colgroup"} | _CELL_INLINE,
    "thead": {"caption", "col", "colgroup"},
    "tbody": {"th", "td", "tr", "caption", "col", "colgroup", "thead",
              "tfoot", "tbody"},
    "tfoot": {"th", "td", "tr", "caption", "col", "colgroup", "thead",
              "tbody"},
    "option": {"option"},
    "optgroup": {"option"},
    "a": {"a"},
    "fieldset": {"legend", "p", "pre", "listing", "xmp", "a",
                 "head"} | _H16,
}
for _h in _H16:
    _START_CLOSE[_h] = {"p", "head"}

# libxml2 htmlEndPriority: a mismatched END tag may only auto-close open
# elements whose priority is not higher than its own (default 100)
_END_PRIORITY = {"div": 150, "td": 160, "table": 170, "head": 180,
                 "body": 190, "html": 200}

# libxml2 htmlCheckImplied's two element lists (HTMLparser.c): a start tag
# from this set at top level implies <head>; any OTHER tag (same list minus
# title/base quirks — the C code spells both lists out and they coincide)
# implies <body> when neither head nor body is open
_HEAD_IMPLIED = {"script", "style", "meta", "link", "title", "base"}


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None, 0)
        self.stack = [self.root]
        self._order = 0
        self._cdata_depth = 0
        # libxml2 ctxt->html skeleton state: 3 = head seen/implied,
        # 10 = body seen/implied (we also set these on ACCEPTED explicit
        # head/body — a small normalization over the C code, which only
        # sets them on the implied path; this prevents double skeletons
        # on exotic inputs like <html><head/></head><title>)
        self._html_state = 0
        # libxml2 ctxt->depth: counts DISCARDED misplaced html/head/body
        # start tags so their matching end tags are swallowed too
        self._discard_depth = 0

    def _autoclose(self, tag):
        closes = _START_CLOSE.get(tag)
        if closes:
            while len(self.stack) > 1 and self.stack[-1].tag in closes:
                self.stack.pop()

    def _push_implied(self, tag):
        # re-enter an existing sibling instead of creating a duplicate
        # skeleton node (content after </html> or </body> re-parents into
        # the one skeleton, as browsers do; the C code can emit sibling
        # roots here — the documented normalization divergence)
        if tag in ("html", "body"):
            for c in self.stack[-1].children:
                if isinstance(c, Node) and c.tag == tag:
                    self.stack.append(c)
                    return
        self._order += 1
        node = Node(tag, {}, self.stack[-1], self._order)
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def _check_implied(self, tag):
        """libxml2 ``htmlCheckImplied`` (HTMLparser.c, public source):
        auto-insert the html/head/body skeleton around out-of-skeleton
        content. <html> is implied under the document root; a top-level
        head-only element implies <head> (once); any other element
        implies <body> when neither head nor body is open (once)."""
        if tag == "html":
            return
        if len(self.stack) <= 1:
            self._push_implied("html")
        if tag in ("body", "head"):
            return
        if len(self.stack) <= 2 and tag in _HEAD_IMPLIED:
            if self._html_state >= 3:
                return  # head already seen/implied: tag stays under html
            self._push_implied("head")
            self._html_state = 3
        elif tag not in _HEAD_IMPLIED:
            if self._html_state >= 10:
                return
            if any(n.tag in ("body", "head") for n in self.stack[1:]):
                return
            self._push_implied("body")
            self._html_state = 10

    def handle_starttag(self, tag, attrs):
        if tag in _CDATA:
            self._cdata_depth += 1
            return
        if self._cdata_depth:
            return
        if tag in _VOID:
            self.handle_startendtag(tag, attrs)
            return
        # libxml2 htmlParseStartTag misplaced-skeleton-tag discards
        # (checked against the stack BEFORE auto-closure, as in the C):
        # a second <html>, a <head> not at nameNr==1, or a <body> while
        # one is open are dropped — but their auto-close/implied side
        # effects still run, and the matching end tag is swallowed
        discard = False
        if tag == "html":
            discard = len(self.stack) > 1
        elif tag == "head":
            discard = len(self.stack) != 2 or self._html_state >= 3
        elif tag == "body":
            discard = any(n.tag == "body" for n in self.stack)
        if discard:
            self._discard_depth += 1
        self._autoclose(tag)
        self._check_implied(tag)
        if discard:
            return
        if tag == "head":
            self._html_state = max(self._html_state, 3)
        elif tag == "body":
            self._html_state = 10
        self._order += 1
        node = Node(tag, dict(attrs), self.stack[-1], self._order)
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if self._cdata_depth or tag in _CDATA:
            return
        self._autoclose(tag)  # void tags auto-close too (<hr> closes <p>)
        self._check_implied(tag)  # <meta> first implies html+head; <img>,
        # <hr>, <br>… imply html+body, exactly like non-void start tags
        self._order += 1
        node = Node(tag, dict(attrs), self.stack[-1], self._order)
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        if tag in _CDATA:
            self._cdata_depth = max(0, self._cdata_depth - 1)
            return
        if self._cdata_depth or tag in _VOID:
            return
        if (tag in ("html", "head", "body")) and self._discard_depth > 0:
            self._discard_depth -= 1  # end tag of a discarded start tag
            return
        # pop to the nearest matching open tag, but a mismatched end tag
        # may only auto-close elements of LOWER end priority — libxml2's
        # htmlEndPriority rule (HTMLparser.c): </b> never reaches across
        # an open div/td/table; the stray end tag is ignored instead
        # (the r7b fix for the inline-overlap divergence class:
        # <b>a<div>b</b> keeps b OPEN, as lxml builds it)
        prio = _END_PRIORITY.get(tag, 100)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
            if _END_PRIORITY.get(self.stack[i].tag, 100) > prio:
                return

    def handle_data(self, data):
        if self._cdata_depth:
            return
        if not data:
            return
        cur = self.stack[-1]
        if cur.tag in ("[document]", "html", "head"):
            if not data.strip(_XML_BLANKS):
                return  # libxml2 areBlanks: blanks in skeleton context
                # are ignorable whitespace, never text nodes
            # libxml2 htmlCheckParagraph (htmlNoContentElements =
            # {html, head}): stray character data at document/html/head
            # level is wrapped in an implied <p> — auto-close first (p
            # closes an open head via htmlStartClose), then imply the
            # skeleton, then open the paragraph
            self._autoclose("p")
            self._check_implied("p")
            self._push_implied("p")
        elif cur.tag == "body" and not cur.children \
                and not data.strip(_XML_BLANKS):
            return  # leading blank run in an empty body is ignorable
        # merge adjacent runs so .text/.tail semantics match lxml's
        # single-string model (charref boundaries split handle_data)
        ch = self.stack[-1].children
        if ch and isinstance(ch[-1], str):
            ch[-1] += data
        else:
            ch.append(data)


def build_tree(html: str) -> Node:
    # EOF-unterminated comment: html.parser re-emits the raw "<!--…" as
    # DATA at close(); HTML5 (and libxml2) treat it as a comment running
    # to EOF — truncate so the raw markup can't leak into extracted text
    cut = html.rfind("<!--")
    if cut != -1 and "-->" not in html[cut:]:
        html = html[:cut]
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass
    root = builder.root
    # parse-time cleaner: drop script/style/link subtrees (htmls.py
    # html_cleaner; comments never enter — no handle_comment)
    def strip(n: Node) -> None:
        n.children = [
            c for c in n.children
            if isinstance(c, str) or c.tag not in _PARSE_DROP
        ]
        for c in n.children:
            if isinstance(c, Node):
                strip(c)
    strip(root)
    _ensure_body(root)
    return root


def _ensure_body(root: Node) -> None:
    """lxml ``document_fromstring`` always yields an html>body skeleton;
    mirror it so fragment-ish pages score identically (the body element
    gets id=readabilityBody and is the <p> parent in both engines)."""
    html = next((c for c in root.children
                 if isinstance(c, Node) and c.tag == "html"), None)
    if html is None:
        html = Node("html", {}, root, 0)
        html.children = root.children
        for c in html.children:
            if isinstance(c, Node):
                c.parent = html
        root.children = [html]
    body = next((c for c in html.children
                 if isinstance(c, Node) and c.tag == "body"), None)
    if body is None:
        head_tags = {"head", "title", "meta", "base"}
        head_part: list = []
        body_part: list = []
        for c in html.children:
            if isinstance(c, Node) and c.tag in head_tags:
                head_part.append(c)
            else:
                body_part.append(c)
        body = Node("body", {}, html, 0)
        body.children = body_part
        for c in body_part:
            if isinstance(c, Node):
                c.parent = body
        html.children = head_part + [body]


def _serialize(node: Node) -> str:
    """Minimal html serializer (lxml ``tostring(method='html')`` shape):
    used for the divToPElementsRe check and the retry-length measurement,
    both of which the reference performs on serialized markup."""
    parts: list[str] = []

    def walk(n: Node) -> None:
        attrs = "".join(
            f' {k}="{escape(v or "", quote=True)}"'
            for k, v in n.attrs.items()
        )
        if n.tag in _VOID:
            parts.append(f"<{n.tag}{attrs}>")
            return
        parts.append(f"<{n.tag}{attrs}>")
        for c in n.children:
            if isinstance(c, str):
                parts.append(escape(c, quote=False))
            else:
                walk(c)
        parts.append(f"</{n.tag}>")

    if node.tag == "[document]":
        for c in node.children:
            if isinstance(c, str):
                parts.append(escape(c, quote=False))
            else:
                walk(c)
    else:
        walk(node)
    return "".join(parts)


def _serialize_with_tail(node: Node) -> str:
    out = _serialize(node)
    tail = node.tail_run()
    if tail:
        out += escape(tail, quote=False)
    return out


# ---------------------------------------------------- readability helpers
# readability/readability.py text helpers — exact arithmetic


_CLEAN_SPACES = re.compile(r"\s{255,}")
_CLEAN_NL = re.compile(r"\s*\n\s*")
_CLEAN_TABS = re.compile(r"\t|[ \t]{2,}")


def _clean(text: str) -> str:
    # "Many spaces make the following regexes run forever"
    text = _CLEAN_SPACES.sub(" " * 255, text)
    text = _CLEAN_NL.sub("\n", text)
    text = _CLEAN_TABS.sub(" ", text)
    return text.strip()


def _text_length(node: Node) -> int:
    return len(_clean(node.text_content() or ""))


def _class_weight(node: Node) -> int:
    """±25 for class and ±25 for id, SEPARATELY (up to ±50 total)."""
    weight = 0
    for feature in [node.get("class", None), node.get("id", None)]:
        if feature:
            if REGEXES["negativeRe"].search(feature):
                weight -= 25
            if REGEXES["positiveRe"].search(feature):
                weight += 25
    return weight


def _score_node(node: Node) -> dict:
    content_score = _class_weight(node)
    name = node.tag.lower()
    if name in ["div", "article"]:
        content_score += 5
    elif name in ["pre", "td", "blockquote"]:
        content_score += 3
    elif name in ["address", "ol", "ul", "dl", "dd", "dt", "li", "form",
                  "aside"]:
        content_score -= 3
    elif name in ["h1", "h2", "h3", "h4", "h5", "h6", "th", "header",
                  "footer", "nav"]:
        content_score -= 5
    return {"content_score": content_score, "elem": node}


def _get_link_density(node: Node) -> float:
    link_length = 0
    for a in node.findall("a"):
        link_length += _text_length(a)
    total_length = _text_length(node)
    return float(link_length) / max(total_length, 1)


def _tags(node: Node, *tag_names: str):
    """readability ``tags``: ALL of tag 1 (document order), then all of
    tag 2, … — the iteration order feeds candidate insertion order, which
    is the tie-break in select_best_candidate. Collected in ONE tree
    walk (order preserved per bucket)."""
    buckets = node.findall_multi(tag_names)
    for tag_name in tag_names:
        yield from buckets[tag_name]


def _reverse_tags(node: Node, *tag_names: str):
    buckets = node.findall_multi(tag_names)
    for tag_name in tag_names:
        yield from reversed(buckets[tag_name])


# ------------------------------------------------------ readability core


def _remove_unlikely_candidates(root: Node) -> None:
    for elem in list(root.iter_nodes()):
        if elem.tag == "[document]":
            continue
        s = "%s %s" % (elem.get("class", ""), elem.get("id", ""))
        if len(s) < 2:
            continue
        if (
            REGEXES["unlikelyCandidatesRe"].search(s)
            and (not REGEXES["okMaybeItsACandidateRe"].search(s))
            and elem.tag not in ["html", "body"]
        ):
            elem.drop_tree()


def _transform_misused_divs(root: Node) -> None:
    # divs with no block-ish markup in their serialized children become p
    for elem in _tags(root, "div"):
        inner = "".join(
            _serialize_with_tail(c) for c in elem.element_children()
        )
        if not REGEXES["divToPElementsRe"].search(inner):
            elem.tag = "p"
    # wrap remaining divs' bare text/tails into explicit <p>s; drop <br>s
    for elem in _tags(root, "div"):
        ch = elem.children
        if ch and isinstance(ch[0], str) and ch[0].strip():
            p = Node("p", {}, elem, -1)
            p.children.append(ch[0])
            ch[0] = p
        for pos in range(len(ch) - 1, -1, -1):
            child = ch[pos]
            if not isinstance(child, Node):
                continue
            tail = child.tail_run()
            if tail is not None and tail.strip():
                p = Node("p", {}, elem, -1)
                p.children.append(tail)
                ch[pos + 1] = p
            if child.tag == "br":
                ch.pop(pos)


def _score_paragraphs(root: Node) -> "dict[Node, dict]":
    candidates: dict[Node, dict] = {}
    ordered: list[Node] = []
    for elem in _tags(root, "p", "pre", "td"):
        parent_node = elem.parent
        if parent_node is None or parent_node.tag == "[document]":
            continue
        grand_parent_node = parent_node.parent
        if grand_parent_node is not None and \
                grand_parent_node.tag == "[document]":
            grand_parent_node = None

        inner_text = _clean(elem.text_content() or "")
        inner_text_len = len(inner_text)
        if inner_text_len < MIN_TEXT_LENGTH:
            continue

        if parent_node not in candidates:
            candidates[parent_node] = _score_node(parent_node)
            ordered.append(parent_node)
        if grand_parent_node is not None and \
                grand_parent_node not in candidates:
            candidates[grand_parent_node] = _score_node(grand_parent_node)
            ordered.append(grand_parent_node)

        content_score = 1
        content_score += len(inner_text.split(","))
        content_score += min((inner_text_len / 100), 3)

        candidates[parent_node]["content_score"] += content_score
        if grand_parent_node is not None:
            candidates[grand_parent_node]["content_score"] += \
                content_score / 2.0

    for elem in ordered:
        candidate = candidates[elem]
        ld = _get_link_density(elem)
        candidate["content_score"] *= 1 - ld
    return candidates


def _select_best_candidate(candidates: "dict[Node, dict]") -> "dict | None":
    if not candidates:
        return None
    sorted_candidates = sorted(
        candidates.values(), key=lambda x: x["content_score"], reverse=True
    )
    return sorted_candidates[0]


def _get_article(candidates: "dict[Node, dict]", best_candidate: dict
                 ) -> Node:
    """Sibling joining — readability get_article(html_partial=True). The
    appended sibling MOVES with its tail (lxml append semantics)."""
    sibling_score_threshold = max(
        [10, best_candidate["content_score"] * 0.2])
    output = Node("div", {}, None, -1)
    best_elem = best_candidate["elem"]
    parent = best_elem.parent
    siblings = parent.element_children() if parent is not None \
        else [best_elem]
    for sibling in siblings:
        append = False
        if sibling is best_elem:
            append = True
        if sibling in candidates and \
                candidates[sibling]["content_score"] >= \
                sibling_score_threshold:
            append = True
        if sibling.tag == "p":
            link_density = _get_link_density(sibling)
            node_content = sibling.text or ""
            node_length = len(node_content)
            if node_length > 80 and link_density < 0.25:
                append = True
            elif (node_length <= 80 and link_density == 0
                  and re.search(r"\.( |$)", node_content)):
                append = True
        if append:
            tail = sibling.tail_run()
            sibling.drop_tree()
            sibling.parent = output
            output.children.append(sibling)
            if tail is not None:
                output.children.append(tail)
    return output


def _sanitize(node: Node, candidates: "dict[Node, dict]") -> Node:
    """The conditional cleaner — readability sanitize, tree-in/tree-out
    (the reference serializes here; html_text re-parses — divergence
    class 2 in the module docstring)."""
    for header in _tags(node, "h1", "h2", "h3", "h4", "h5", "h6"):
        if _class_weight(header) < 0 or _get_link_density(header) > 0.33:
            header.drop_tree()

    for elem in _tags(node, "form", "textarea"):
        elem.drop_tree()

    for elem in _tags(node, "iframe"):
        if "src" in elem.attrs and \
                REGEXES["videoRe"].search(elem.attrs["src"] or ""):
            elem.children = ["VIDEO"]
        else:
            elem.drop_tree()

    allowed: dict = {}
    for el in _reverse_tags(node, "table", "ul", "div", "aside"):
        if el in allowed:
            continue
        if el.parent is None and el is not node:
            continue  # already dropped with an ancestor
        weight = _class_weight(el)
        content_score = candidates[el]["content_score"] \
            if el in candidates else 0
        tag = el.tag

        if weight + content_score < 0:
            el.drop_tree()
        elif el.text_content().count(",") < 10:
            counts = {}
            for kind in ["p", "img", "li", "a", "embed", "input"]:
                counts[kind] = len(el.findall(kind))
            counts["li"] -= 100
            counts["input"] -= len([
                i for i in el.findall("input")
                if (i.get("type") or "") == "hidden"
            ])

            content_length = _text_length(el)
            link_density = _get_link_density(el)
            parent_node = el.parent
            if parent_node is not None and parent_node.tag != "[document]":
                content_score = candidates[parent_node]["content_score"] \
                    if parent_node in candidates else 0

            to_remove = False
            if counts["p"] and counts["img"] > 1 + counts["p"] * 1.3:
                to_remove = True       # too many images
            elif counts["li"] > counts["p"] and tag not in ("ol", "ul"):
                to_remove = True       # more <li>s than <p>s
            elif counts["input"] > (counts["p"] / 3):
                to_remove = True       # too many inputs
            elif content_length < MIN_TEXT_LENGTH and counts["img"] == 0:
                to_remove = True       # too short, no image
            elif content_length < MIN_TEXT_LENGTH and counts["img"] > 2:
                to_remove = True       # too short, too many images
            elif weight < 25 and link_density > 0.2:
                to_remove = True       # too many links for weight
            elif weight >= 25 and link_density > 0.5:
                to_remove = True       # too many links for high weight
            elif (counts["embed"] == 1 and content_length < 75) \
                    or counts["embed"] > 1:
                to_remove = True       # embed-dominated

            if to_remove:
                # the 1000-char sibling allowance: one non-empty sibling
                # on each side; if together they carry real content, keep
                # this block and whitelist its container descendants
                i, j = 0, 0
                x = 1
                siblings_len = []
                for sib in el.itersiblings():
                    sib_content_length = _text_length(sib)
                    if sib_content_length:
                        i += 1
                        siblings_len.append(sib_content_length)
                        if i == x:
                            break
                for sib in el.itersiblings(preceding=True):
                    sib_content_length = _text_length(sib)
                    if sib_content_length:
                        j += 1
                        siblings_len.append(sib_content_length)
                        if j == x:
                            break
                if siblings_len and sum(siblings_len) > 1000:
                    to_remove = False
                    allowed[el] = True
                    for desnode in _tags(el, "table", "ul", "div",
                                         "section"):
                        allowed[desnode] = True

            if to_remove:
                el.drop_tree()
    return node


def summary_tree(source_html: str, first_tree: Node | None = None) -> Node:
    """``Document(txt).summary(html_partial=True)`` as a TREE (the
    reference returns serialized markup and html_text re-parses it —
    divergence class 2). Implements the full ruthless/retry loop
    (readability.py summary): re-parse fresh each attempt, retry without
    unlikely-candidate removal when the cleaned article serializes under
    RETRY_LENGTH chars.

    ``first_tree`` lets the caller donate an already-built tree for the
    FIRST attempt (it is consumed destructively); retries always
    re-parse, matching readability's fresh ``self._html(True)``."""
    ruthless = True
    while True:
        root, first_tree = first_tree or build_tree(source_html), None
        for b in _tags(root, "body"):
            b.set("id", "readabilityBody")
        if ruthless:
            _remove_unlikely_candidates(root)
        _transform_misused_divs(root)
        candidates = _score_paragraphs(root)

        best_candidate = _select_best_candidate(candidates)
        if best_candidate:
            article = _get_article(candidates, best_candidate)
        else:
            if ruthless:
                ruthless = False
                continue
            article = root.find_first("body")
            if article is None:
                article = root

        cleaned = _sanitize(article, candidates)
        article_length = len(_serialize(cleaned) or "")
        if ruthless and article_length < RETRY_LENGTH:
            ruthless = False
            continue
        return cleaned


# -------------------------------------------------------------- title
# readability/htmls.py — get_title / norm_title, exact


def _normalize_spaces(s: str) -> str:
    if not s:
        return ""
    return " ".join(s.split())


_TITLE_ENTITIES = {
    "—": "-",
    "–": "-",
    "&mdash;": "-",
    "&ndash;": "-",
    " ": " ",
    "«": '"',
    "»": '"',
    "&quot;": '"',
}


def _norm_title(title: str) -> str:
    title = _normalize_spaces(title)
    for c, r in _TITLE_ENTITIES.items():
        if c in title:
            title = title.replace(c, r)
    return title


def get_title(root: Node) -> str:
    title = root.find_first("title")
    if title is None or title.text is None or len(title.text) == 0:
        return "[no-title]"
    return _norm_title(title.text)


# ------------------------------------------------------- html_text port
# html_text etree_to_text — exact constants and space/newline logic

NEWLINE_TAGS = frozenset([
    "article", "aside", "br", "dd", "details", "div", "dt", "fieldset",
    "figcaption", "footer", "form", "header", "hr", "legend", "li", "main",
    "nav", "table", "tr",
])
DOUBLE_NEWLINE_TAGS = frozenset([
    "blockquote", "dl", "figure", "h1", "h2", "h3", "h4", "h5", "h6", "ol",
    "p", "pre", "title", "ul",
])

_has_trailing_whitespace = re.compile(r"\s$").search
_has_punct_after = re.compile(r'^[,:;.!?")]').search
_has_open_bracket_before = re.compile(r"\($").search

# html_text's cleaner: scripts/style/comments already gone at our parse;
# links=True and meta=True additionally kill <link>/<meta> (void tags —
# no text anyway). frames/forms/embedded are KEPT ("keep frames",
# "keep forms" in html_text's own config comments).


def etree_to_text(tree: Node, guess_punct_space: bool = True,
                  guess_layout: bool = True) -> str:
    chunks: list[str] = []
    _NEWLINE = object()
    _DOUBLE_NEWLINE = object()
    prev_holder = {"prev": _DOUBLE_NEWLINE}

    def should_add_space(text, prev) -> bool:
        if prev in (_NEWLINE, _DOUBLE_NEWLINE):
            return False
        if not _has_trailing_whitespace(prev):
            if _has_punct_after(text) or _has_open_bracket_before(prev):
                return False
        return True

    def get_space_between(text, prev) -> str:
        if not text or not guess_punct_space:
            return " "
        return " " if should_add_space(text, prev) else ""

    def add_newlines(tag) -> None:
        if not guess_layout:
            return
        prev = prev_holder["prev"]
        if prev is _DOUBLE_NEWLINE:  # never more than one blank line
            return
        if tag in DOUBLE_NEWLINE_TAGS:
            chunks.append("\n" if prev is _NEWLINE else "\n\n")
            prev_holder["prev"] = _DOUBLE_NEWLINE
        elif tag in NEWLINE_TAGS:
            if prev is not _NEWLINE:
                chunks.append("\n")
            prev_holder["prev"] = _NEWLINE

    def add_text(text_content) -> None:
        text = _WS_RUN.sub(" ", (text_content or "").strip())
        if not text:
            return
        space = get_space_between(text, prev_holder["prev"])
        chunks.extend([space, text])
        prev_holder["prev"] = text_content

    def traverse(n: Node) -> None:
        add_newlines(n.tag)
        for c in n.children:
            if isinstance(c, str):
                add_text(c)
            else:
                traverse(c)
        add_newlines(n.tag)

    # root handled with handle_tail=False in html_text; our tree-root has
    # no tail by construction
    traverse(tree)
    return "".join(chunks).strip()


# ---------------------------------------------------------------- surface


def extract(html: str) -> tuple[str, str]:
    """Return (title, main_content_text) — ``Document.title()`` +
    ``html_text.extract_text(Document.summary(html_partial=True))``."""
    tree = build_tree(html)
    title = get_title(tree)
    # donate the tree: get_title only READS it, so the first summary
    # attempt can consume it instead of re-parsing (2x parse → 1x)
    article = summary_tree(html, first_tree=tree)
    return title, etree_to_text(article)


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
