"""Minimal pure-Python PDF text layer.

The reference's no-layout PDF path is ``PlainParser``
(deepdoc/parser/pdf_parser.py:1142-1168): pypdf ``extract_text()`` per page,
split on newlines, emitted as ``[(line, "")]`` sections plus a pypdf outline
walk. pypdf / pdfplumber are not installed here, so this module provides:

- ``build_simple_pdf(pages)``: a deterministic single-font PDF writer used
  by the fixture generator (uncompressed or Flate content streams, one
  ``Tj`` per line) — so the extractor below can be tested honestly against
  real PDF bytes it did not itself produce the parse for.
- ``extract_text_lines(blob)``: a text extractor for the "simple text PDF"
  subset: walks the page tree (/Root → /Pages → /Kids → /Contents), inflates
  FlateDecode streams, and evaluates BT/ET text blocks (Tj, TJ, ', ")
  with PDF string escapes. Scanned/CID/ToUnicode-mapped PDFs are out of
  scope for this extractor and raise ``UnsupportedPdfError`` — the vision
  OCR tier (SURVEY.md §2.8) is the reference's answer there and is stubbed
  behind ``ragflow_spark.operators.multimodal``.

The full layout-analysis pipeline (§3.3 of SURVEY.md) requires ONNX models
that are not vendored in the reference repo either; per SURVEY §7.1.6 the
vision backend is pluggable and absent in this sandbox.
"""

from __future__ import annotations

import re
import zlib


class UnsupportedPdfError(ValueError):
    pass


# ------------------------------------------------------------------ writer


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_simple_pdf(pages: list[list[str]], compress: bool = True,
                     outlines: list[tuple[str, int]] | None = None) -> bytes:
    """Deterministic PDF with one Helvetica text column per page; each list
    entry becomes one text line (one ``Tj`` operator). ``outlines`` is an
    optional bookmark list of (title, depth) pairs serialized as a real
    /Outlines tree (First/Next/Parent links)."""
    content_pages = []
    for lines in pages:
        ops = ["BT", "/F1 11 Tf", "1 0 0 1 72 770 Tm", "13 TL"]
        for ln in lines:
            ops.append(f"({_esc(ln)}) Tj")
            ops.append("T*")
        ops.append("ET")
        content_pages.append(ops)
    return _assemble_pdf(content_pages, compress, outlines)


def build_positioned_pdf(pages: list[list[tuple]],
                         compress: bool = True) -> bytes:
    """PDF writer with explicit (x, y, text[, gray]) placement per line (y
    is the baseline in PDF bottom-up coordinates) — used to synthesize
    multi-column / table fixtures. An optional 4th element sets the gray
    fill level (``1.0`` = white-on-white invisible text, for F2 tests)."""
    content_pages = []
    for items in pages:
        ops = ["BT", "/F1 11 Tf"]
        gray = 0.0
        for item in items:
            x, y, text = item[0], item[1], item[2]
            g = item[3] if len(item) > 3 else 0.0
            if g != gray:
                ops.append(f"{g:g} g")
                gray = g
            ops.append(f"1 0 0 1 {x:g} {y:g} Tm")
            ops.append(f"({_esc(text)}) Tj")
        ops.append("ET")
        content_pages.append(ops)
    return _assemble_pdf(content_pages, compress)


def _assemble_pdf(content_pages: list[list[str]], compress: bool,
                  outlines: list[tuple[str, int]] | None = None) -> bytes:
    objects: list[bytes] = []

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)

    font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    content_nums = []
    for ops in content_pages:
        data = "\n".join(ops).encode("latin-1", errors="replace")
        if compress:
            comp = zlib.compress(data, 9)
            stream = (
                b"<< /Length " + str(len(comp)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream"
            )
        else:
            stream = (
                b"<< /Length " + str(len(data)).encode()
                + b" >>\nstream\n" + data + b"\nendstream"
            )
        content_nums.append(add(stream))
    page_nums = []
    pages_num_placeholder = len(objects) + len(content_pages) + 1
    for cn in content_nums:
        page_nums.append(add((
            f"<< /Type /Page /Parent {pages_num_placeholder} 0 R "
            f"/MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {cn} 0 R >>"
        ).encode()))
    kids = " ".join(f"{n} 0 R" for n in page_nums)
    pages_num = add(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_nums)} >>".encode()
    )
    assert pages_num == pages_num_placeholder

    outline_ref = ""
    if outlines:
        # numbers are pre-computed because the tree links are circular
        root_num = len(objects) + 1
        item_nums = [root_num + 1 + i for i in range(len(outlines))]
        parent = []
        stack: list[int] = []
        for i, (_t, d) in enumerate(outlines):
            while stack and outlines[stack[-1]][1] >= d:
                stack.pop()
            parent.append(stack[-1] if stack else -1)
            stack.append(i)
        children: dict[int, list[int]] = {}
        for i, p in enumerate(parent):
            children.setdefault(p, []).append(i)
        top = children.get(-1, [])
        add((
            f"<< /Type /Outlines /First {item_nums[top[0]]} 0 R "
            f"/Last {item_nums[top[-1]]} 0 R /Count {len(outlines)} >>"
        ).encode())
        for i, (title, _d) in enumerate(outlines):
            sibs = children.get(parent[i], [])
            k = sibs.index(i)
            parts = [f"/Title ({_esc(title)})"]
            parts.append(
                f"/Parent {root_num if parent[i] == -1 else item_nums[parent[i]]} 0 R"
            )
            if k > 0:
                parts.append(f"/Prev {item_nums[sibs[k - 1]]} 0 R")
            if k + 1 < len(sibs):
                parts.append(f"/Next {item_nums[sibs[k + 1]]} 0 R")
            kids_i = children.get(i, [])
            if kids_i:
                parts.append(f"/First {item_nums[kids_i[0]]} 0 R")
                parts.append(f"/Last {item_nums[kids_i[-1]]} 0 R")
            add(("<< " + " ".join(parts) + " >>").encode())
        outline_ref = f" /Outlines {root_num} 0 R"

    catalog_num = add(
        f"<< /Type /Catalog /Pages {pages_num} 0 R{outline_ref} >>".encode()
    )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root {catalog_num} 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# --------------------------------------------------------------- extractor

_HDR_RE = re.compile(rb"(\d+)\s+0\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_TJ_STR = re.compile(rb"\((?:\\.|[^\\()])*\)")


def _parse_objects(blob: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """Sequential object walk → {num: (dict_bytes, stream_bytes|None)}.

    Compressed stream payloads are arbitrary bytes and can contain literal
    'endobj'/'endstream' sequences, so a global regex scan mis-splits them;
    instead we walk object by object and honor the /Length entry to skip
    stream payloads exactly."""
    out: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    n = len(blob)
    while True:
        m = _HDR_RE.search(blob, pos)
        if not m:
            break
        num = int(m.group(1))
        sm = _STREAM_START_RE.search(blob, m.end())
        eo = blob.find(b"endobj", m.end())
        if sm is not None and (eo == -1 or sm.start() < eo):
            dict_part = blob[m.end():sm.start()]
            # '/Length 5 0 R' is an indirect reference — its first integer is
            # an object number, not the byte count; treating it as a length
            # would truncate the stream. Fall back to the endstream scan.
            if re.search(rb"/Length\s+\d+\s+\d+\s+R\b", dict_part):
                lm = None
            else:
                lm = re.search(rb"/Length\s+(\d+)\b", dict_part)
            data_start = sm.end()
            if lm:
                data_end = min(n, data_start + int(lm.group(1)))
            else:
                data_end = blob.find(b"endstream", data_start)
                if data_end < 0:
                    data_end = n
            out[num] = (dict_part, blob[data_start:data_end])
            nxt = blob.find(b"endobj", data_end)
            pos = (nxt + 6) if nxt >= 0 else data_end
        else:
            end = eo if eo >= 0 else n
            out[num] = (blob[m.end():end], None)
            pos = (eo + 6) if eo >= 0 else n
    return out


def _inflate(dict_part: bytes, data: bytes | None) -> bytes | None:
    if data is None:
        return None
    if b"/FlateDecode" in dict_part:
        try:
            return zlib.decompress(data)
        except Exception as exc:
            raise UnsupportedPdfError(f"bad Flate stream: {exc}") from exc
    return data


def _pdf_unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0x5C and i + 1 < len(raw):  # backslash
            nxt = raw[i + 1]
            mapping = {
                ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
                ord("b"): b"\b", ord("f"): b"\f", ord("("): b"(",
                ord(")"): b")", ord("\\"): b"\\",
            }
            if nxt in mapping:
                out += mapping[nxt]
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal escape, up to 3 digits
                j = i + 1
                digits = b""
                while j < len(raw) and len(digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    digits += bytes([raw[j]])
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            i += 1
            continue
        out.append(b)
        i += 1
    return out.decode("latin-1")


def _content_text_lines(content: bytes) -> list[str]:
    """Evaluate text-showing operators in reading order of the stream.
    Each Tj / ' / " emits onto the current line; T* / Td / TD / TL-driven
    moves end the line (simple single-column model)."""
    lines: list[str] = []
    current: list[str] = []

    def flush():
        if current:
            lines.append("".join(current))
            current.clear()

    # tokenize coarsely: string literals, TJ arrays, operators
    token_re = re.compile(
        rb"\((?:\\.|[^\\()])*\)|\[(?:\\.|\((?:\\.|[^\\()])*\)|[^\]])*\]|[A-Za-z'\"*]+"
    )
    in_text = False
    pending: str | None = None  # last string literal awaiting its operator
    for m in token_re.finditer(content):
        tok = m.group(0)
        if tok == b"BT":
            in_text = True
            continue
        if tok == b"ET":
            in_text = False
            flush()
            continue
        if not in_text:
            continue
        if tok.startswith(b"("):
            pending = _pdf_unescape(tok[1:-1])
            continue
        if tok.startswith(b"["):
            # TJ array: concatenate its strings (kern numbers ignored)
            current.append(
                "".join(_pdf_unescape(s[1:-1]) for s in _TJ_STR.findall(tok))
            )
            pending = None
            continue
        if tok == b"Tj":
            if pending is not None:
                current.append(pending)
                pending = None
        elif tok in (b"'", b'"'):
            flush()
            if pending is not None:
                current.append(pending)
                pending = None
        elif tok in (b"T*", b"Td", b"TD"):
            flush()
    flush()
    return lines


def extract_text_lines(blob: bytes) -> list[list[str]]:
    """Per-page text lines for the simple-text-PDF subset."""
    if not blob.startswith(b"%PDF"):
        raise UnsupportedPdfError("not a PDF")
    objects = _parse_objects(blob)
    # find page objects in /Kids order when possible
    page_order: list[int] = []
    for num, (dct, _data) in sorted(objects.items()):
        if b"/Type /Pages" in dct or b"/Type/Pages" in dct:
            for m in re.finditer(rb"(\d+)\s+0\s+R", dct.split(b"/Kids", 1)[-1]):
                n = int(m.group(1))
                if n in objects and n not in page_order:
                    page_order.append(n)
    if not page_order:
        page_order = [
            n for n, (dct, _d) in sorted(objects.items())
            if b"/Type /Page" in dct or b"/Type/Page" in dct
        ]
    pages: list[list[str]] = []
    for pn in page_order:
        dct, _d = objects.get(pn, (b"", None))
        if b"/Type /Page" not in dct and b"/Type/Page" not in dct:
            continue
        m = re.search(rb"/Contents\s+(\d+)\s+0\s+R", dct)
        if not m:
            pages.append([])
            continue
        cdct, cdata = objects.get(int(m.group(1)), (b"", None))
        data = _inflate(cdct, cdata)
        if data is None:
            pages.append([])
            continue
        pages.append(_content_text_lines(data))
    if not pages:
        raise UnsupportedPdfError("no extractable pages")
    return pages


# ------------------------------------------------------- box extraction

_NUM_RE = rb"[-+]?[0-9]*\.?[0-9]+"


def _content_boxes(content: bytes, page_height: float) -> list[dict]:
    """Positioned text boxes from one content stream. Tracks the text
    cursor through Tf/Tm/Td/TD/TL/T* and converts the PDF bottom-left
    origin to the reference's top-down box coordinates
    (top = page_height - baseline_y - size; bottom = top + size ≈ ascent
    box). x1 is estimated from a 0.5·size average glyph advance — the
    deterministic stand-in for font metrics this heuristic backend uses."""
    boxes: list[dict] = []
    tok = re.compile(
        rb"\((?:\\.|[^\\()])*\)"                 # string
        rb"|\[(?:\\.|\((?:\\.|[^\\()])*\)|[^\]])*\]"  # TJ array
        rb"|" + _NUM_RE +                         # number
        rb"|[A-Za-z'\"*]+"                        # operator
    )
    in_text = False
    size = 11.0
    x = y = 0.0
    tl = 0.0
    stack_nums: list[float] = []
    pending: str | None = None
    fill_visible = True  # F2: white-on-white text is dropped at collection

    def emit(text: str) -> None:
        if not text or not fill_visible:
            return
        top = page_height - y - size
        boxes.append({
            "text": text,
            "x0": x,
            "x1": x + 0.5 * size * max(1, len(text)),
            "top": top,
            "bottom": top + size * 1.2,
        })

    for m in tok.finditer(content):
        t = m.group(0)
        if t == b"BT":
            in_text = True
            stack_nums.clear()
            continue
        if t == b"ET":
            in_text = False
            stack_nums.clear()
            continue
        if not in_text:
            continue
        if re.fullmatch(_NUM_RE, t):
            stack_nums.append(float(t))
            continue
        if t.startswith(b"("):
            pending = _pdf_unescape(t[1:-1])
            continue
        if t.startswith(b"["):
            emit("".join(_pdf_unescape(s[1:-1]) for s in _TJ_STR.findall(t)))
            pending = None
            stack_nums.clear()
            continue
        # operators
        if t == b"Tf":
            if stack_nums:
                size = stack_nums[-1]
        elif t == b"Tm":
            if len(stack_nums) >= 2:
                x, y = stack_nums[-2], stack_nums[-1]
        elif t in (b"Td", b"TD"):
            if len(stack_nums) >= 2:
                x += stack_nums[-2]
                y += stack_nums[-1]
                if t == b"TD":
                    tl = -stack_nums[-1]
        elif t == b"TL":
            if stack_nums:
                tl = stack_nums[-1]
        # F2 invisible chars (pdf_parser.py:178-184 _has_color): text whose
        # fill color is (near-)white never reaches the box stream. Gray /
        # RGB / CMYK non-stroking color operators tracked; stroke color (G,
        # RG, K) is irrelevant for fill-rendered text.
        elif t == b"g":
            if stack_nums:
                fill_visible = stack_nums[-1] < 0.95
        elif t == b"rg":
            if len(stack_nums) >= 3:
                fill_visible = not all(v >= 0.95 for v in stack_nums[-3:])
        elif t == b"k":
            if len(stack_nums) >= 4:
                fill_visible = not all(v <= 0.05 for v in stack_nums[-4:])
        elif t == b"T*":
            y -= tl
        elif t == b"Tj":
            if pending is not None:
                emit(pending)
                pending = None
        elif t in (b"'", b'"'):
            y -= tl
            if pending is not None:
                emit(pending)
                pending = None
        stack_nums.clear()
    return boxes


def _page_order(objects: dict) -> list[int]:
    """Page object numbers in document order (Kids walk, flat fallback)."""
    page_order: list[int] = []
    for num, (dct, _data) in sorted(objects.items()):
        if b"/Type /Pages" in dct or b"/Type/Pages" in dct:
            for m in re.finditer(rb"(\d+)\s+0\s+R", dct.split(b"/Kids", 1)[-1]):
                n = int(m.group(1))
                if n in objects and n not in page_order:
                    page_order.append(n)
    if not page_order:
        page_order = [
            n for n, (dct, _d) in sorted(objects.items())
            if b"/Type /Page" in dct or b"/Type/Page" in dct
        ]
    return page_order


_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*(" + _NUM_RE + rb")\s+(" + _NUM_RE + rb")\s+("
    + _NUM_RE + rb")\s+(" + _NUM_RE + rb")"
)


def _page_ybox(dct: bytes, objects: dict,
               page_num: int | None = None) -> tuple[float, float]:
    """(y0, y1) of a page's MediaBox. MediaBox is an INHERITABLE page
    attribute — when the page dict lacks one, the page's ACTUAL /Pages
    ancestors supply it (nearest first, via the /Kids child→parent map —
    a document can hold subtrees with different MediaBoxes); US-Letter
    (0, 792) as last resort. Height is y1 - y0 and the content y-flip
    reference is y1 (top edge), which only coincide when the origin sits
    at 0."""
    mb = _MEDIABOX_RE.search(dct)
    if mb is None and page_num is not None:
        parent_of: dict[int, int] = {}
        for num, (pdct, _pd) in objects.items():
            if b"/Type /Pages" in pdct or b"/Type/Pages" in pdct:
                for m in re.finditer(
                    rb"(\d+)\s+0\s+R", pdct.split(b"/Kids", 1)[-1]
                ):
                    parent_of.setdefault(int(m.group(1)), num)
        seen: set[int] = set()
        node = parent_of.get(page_num)
        while node is not None and node not in seen:
            seen.add(node)
            pdct, _pd = objects.get(node, (b"", None))
            mb = _MEDIABOX_RE.search(pdct)
            if mb is not None:
                break
            node = parent_of.get(node)
    if mb is None:
        return 0.0, 792.0
    return float(mb.group(2)), float(mb.group(4))


def _page_dicts(objects: dict):
    """(object number, page dict) in document order — THE shared walk
    both the box extractor and the height scan use, so their lists stay
    aligned index-for-index by construction."""
    for pn in _page_order(objects):
        dct, _d = objects.get(pn, (b"", None))
        if b"/Type /Page" in dct or b"/Type/Page" in dct:
            yield pn, dct


def page_heights(blob: bytes) -> list[float]:
    """Real MediaBox height (y1 - y0) per page, aligned index-for-index
    with ``extract_boxes``' pages list (same ``_page_dicts`` walk). The
    reference accumulates ACTUAL page heights into ``page_cum_height``
    (pdf_parser.py ``__images__``); callers that rebuild doc-absolute
    offsets (qa's has_qbullet spacing veto) need these rather than a
    pinned 792."""
    if not blob.startswith(b"%PDF"):
        raise UnsupportedPdfError("not a PDF")
    objects = _parse_objects(blob)
    return [
        y1 - y0 for y0, y1 in
        (_page_ybox(dct, objects, num)
         for num, dct in _page_dicts(objects))
    ]


def extract_boxes(blob: bytes) -> list[list[dict]]:
    """Per-page positioned text boxes (the heuristic stand-in for the OCR
    box stream of SURVEY §2.8 V1/V2). Adds 1-based ``page_number``."""
    if not blob.startswith(b"%PDF"):
        raise UnsupportedPdfError("not a PDF")
    objects = _parse_objects(blob)
    pages: list[list[dict]] = []
    for num, dct in _page_dicts(objects):
        # y-flip reference is the MediaBox TOP edge (y1): top = y1 - y
        _y0, page_h = _page_ybox(dct, objects, num)
        m = re.search(rb"/Contents\s+(\d+)\s+0\s+R", dct)
        if not m:
            pages.append([])
            continue
        cdct, cdata = objects.get(int(m.group(1)), (b"", None))
        data = _inflate(cdct, cdata)
        page_boxes = _content_boxes(data, page_h) if data is not None else []
        for b in page_boxes:
            b["page_number"] = len(pages) + 1
        pages.append(page_boxes)
    if not pages:
        raise UnsupportedPdfError("no extractable pages")
    return pages


def page_count(blob: bytes) -> int:
    """Page count from the object tree only — no content-stream decode
    (the ``PdfParser.total_page_number`` role task splitting needs,
    api/db/services/task_service.py:164)."""
    if not blob.startswith(b"%PDF"):
        raise UnsupportedPdfError("not a PDF")
    objects = _parse_objects(blob)
    pat = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")  # not /Pages
    return sum(
        1 for _n, (dct, _d) in objects.items() if pat.search(dct)
    )


_PDF_STR = re.compile(rb"\((?:\\.|[^\\()])*\)")


def extract_outlines(blob: bytes) -> list[tuple[str, int]]:
    """S4: DFS over the /Outlines tree → [(title, depth)], the same order
    and shape the reference collects via pypdf (pdf_parser.py:966-979:
    ``dfs(outlines, 0)`` appending (a['/Title'], depth)). Returns [] when
    the document carries no outline — the reference logs 'Miss outlines'
    and continues the same way."""
    if not blob.startswith(b"%PDF"):
        raise UnsupportedPdfError("not a PDF")
    objects = _parse_objects(blob)
    root = None
    for _num, (dct, _data) in sorted(objects.items()):
        if b"/Type /Catalog" in dct or b"/Type/Catalog" in dct:
            m = re.search(rb"/Outlines\s+(\d+)\s+0\s+R", dct)
            if m:
                root = int(m.group(1))
            break
    if root is None:
        return []
    out: list[tuple[str, int]] = []
    seen: set[int] = set()

    def first_child(dct: bytes) -> int | None:
        m = re.search(rb"/First\s+(\d+)\s+0\s+R", dct)
        return int(m.group(1)) if m else None

    def walk(num: int | None, depth: int) -> None:
        while num is not None and num not in seen:
            seen.add(num)
            dct, _d = objects.get(num, (b"", None))
            tm = re.search(rb"/Title\s*(\((?:\\.|[^\\()])*\))", dct)
            if tm:
                out.append((_pdf_unescape(tm.group(1)[1:-1]), depth))
            child = first_child(dct)
            if child is not None:
                walk(child, depth + 1)
            nm = re.search(rb"/Next\s+(\d+)\s+0\s+R", dct)
            num = int(nm.group(1)) if nm else None

    root_dct, _ = objects.get(root, (b"", None))
    walk(first_child(root_dct), 0)
    return out


def plain_parse(blob: bytes, from_page: int = 0, to_page: int = 100000
                ) -> list[tuple[str, str]]:
    """PlainParser equivalent (pdf_parser.py:1142-1168): per-page
    ``extract_text`` split on newlines → [(line, "")] sections within the
    requested page window."""
    pages = extract_text_lines(blob)
    sections: list[tuple[str, str]] = []
    for pn, lines in enumerate(pages):
        if pn < from_page:
            continue
        if pn >= to_page:
            break
        for ln in lines:
            # EMPTY lines stay: the reference extends with every
            # extract_text().split("\n") entry unfiltered
            # (pdf_parser.py:1149) — consumers filter (or keep) them
            # per template, e.g. paper joins them as blank lines
            sections.append((ln, ""))
    return sections
