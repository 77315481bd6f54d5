"""Functional stand-ins for python-docx / openpyxl / python-pptx, used
ONLY to execute the reference's office parser paths in the A/B suites
(the real packages are absent from this container).

Each facade parses the OOXML with stdlib zipfile + ElementTree and
exposes exactly the attribute surface the reference touches:

- docx.Document: .paragraphs (.text, .runs[].text / ._element.xml,
  .style.name, ._element.xpath), .tables (.rows[].cells[].text),
  .part.related_parts
- openpyxl.load_workbook: .sheetnames, wb[name].rows -> cells with .value
- pptx.Presentation: .slides[].shapes with .shape_type /
  .has_text_frame / .text_frame.text / .top / .left

These are stand-ins for PUBLIC library behaviour, shared across both
sides of the A/B the same way the tokenizer stand-in is: what the A/B
then genuinely exercises is everything the reference does DOWNSTREAM of
the library (pagination, style routing, table serialization, template
logic)."""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"


# ------------------------------------------------------------------ docx


class _Style:
    def __init__(self, name):
        self.name = name


class _Element:
    def __init__(self, el):
        self._el = el

    @property
    def xml(self):
        return ET.tostring(self._el, encoding="unicode")

    def xpath(self, pattern):
        # only the picture probes reach this (naive.py get_picture); the
        # fixtures carry no images
        return []


class _Run:
    def __init__(self, el):
        self._element = _Element(el)
        self.text = "".join(t.text or "" for t in el.iter(f"{_W}t"))


class _Paragraph:
    def __init__(self, el, style_names):
        self._element = _Element(el)
        self.runs = [_Run(r) for r in el.findall(f"{_W}r")]
        parts = []
        for node in el.iter():
            if node.tag == f"{_W}t":
                parts.append(node.text or "")
            elif node.tag == f"{_W}tab":
                parts.append("\t")
            elif node.tag in (f"{_W}br", f"{_W}cr"):
                parts.append("\n")
        self.text = "".join(parts)
        ps = el.find(f"{_W}pPr/{_W}pStyle")
        sid = ps.attrib.get(f"{_W}val") if ps is not None else None
        self.style = _Style(style_names.get(sid, sid) if sid else "Normal")


class _Cell:
    def __init__(self, text):
        self.text = text


class _Row:
    def __init__(self, cells):
        self.cells = cells


class _DocxTable:
    """python-docx row.cells semantics: merged cells repeat into every
    spanned grid position — gridSpan repeats horizontally, a vMerge
    continue cell yields the text of the cell above (the same expansion
    ragflow_spark.core.office.docx_table_grids implements, so the A/B
    exercises it on both sides)."""

    def __init__(self, el):
        self.rows = []
        prev: list[_Cell] = []
        for tr in el.findall(f"{_W}tr"):
            out: list[_Cell] = []
            for tc in tr.findall(f"{_W}tc"):
                text = "\n".join(
                    "".join(t.text or "" for t in p.iter(f"{_W}t"))
                    for p in tc.findall(f"{_W}p")
                )
                span, vmerge_cont = 1, False
                tc_pr = tc.find(f"{_W}tcPr")
                if tc_pr is not None:
                    gs = tc_pr.find(f"{_W}gridSpan")
                    if gs is not None:
                        try:
                            span = max(1, int(gs.get(f"{_W}val") or "1"))
                        except ValueError:
                            span = 1
                    vm = tc_pr.find(f"{_W}vMerge")
                    if vm is not None and \
                            (vm.get(f"{_W}val") or "continue") != "restart":
                        vmerge_cont = True
                for _ in range(span):
                    col = len(out)
                    if vmerge_cont and col < len(prev):
                        out.append(prev[col])
                    else:
                        out.append(_Cell(text))
            self.rows.append(_Row(out))
            prev = out


class _Part:
    related_parts: dict = {}


class DocxDocument:
    def __init__(self, src):
        blob = src.read() if hasattr(src, "read") else open(src, "rb").read()
        zf = zipfile.ZipFile(BytesIO(blob))
        style_names: dict[str, str] = {}
        if "word/styles.xml" in zf.namelist():
            sroot = ET.fromstring(zf.read("word/styles.xml"))
            for st in sroot.iter(f"{_W}style"):
                sid = st.attrib.get(f"{_W}styleId")
                nm = st.find(f"{_W}name")
                if sid and nm is not None:
                    style_names[sid] = nm.attrib.get(f"{_W}val", sid)
        root = ET.fromstring(zf.read("word/document.xml"))
        body = root.find(f"{_W}body")
        self.paragraphs = [
            _Paragraph(el, style_names) for el in body.findall(f"{_W}p")
        ]
        self.tables = [_DocxTable(el) for el in body.findall(f"{_W}tbl")]
        self.part = _Part()


# --------------------------------------------------------------- openpyxl


class _XCell:
    def __init__(self, value):
        self.value = value


class _Worksheet:
    def __init__(self, rows):
        self.rows = [tuple(_XCell(v) for v in row) for row in rows]


class Workbook:
    def __init__(self, sheets):
        self.sheetnames = [name for name, _ in sheets]
        self._ws = {name: _Worksheet(rows) for name, rows in sheets}

    def __getitem__(self, name):
        return self._ws[name]


def load_workbook(src, **kwargs):
    from ragflow_spark.core.office import _xlsx_sheets

    blob = src.read() if hasattr(src, "read") else open(src, "rb").read()
    return Workbook(_xlsx_sheets(blob))


# ------------------------------------------------------------------ pptx


class _TextFrame:
    def __init__(self, text):
        self.text = text


def _ppt_off(el):
    off = el.find(f".//{_A}off")
    if off is None:
        return 0, 0
    return (int(off.attrib.get("y", 0)), int(off.attrib.get("x", 0)))


def _ppt_body_text(body):
    # python-pptx text_frame.text: "\n".join over ALL paragraphs (empty
    # paragraphs contribute empty lines), runs concatenated
    return "\n".join(
        "".join(t.text or "" for t in p.iter(f"{_A}t"))
        for p in body.findall(f"{_A}p")
    )


class _Shape:
    """python-pptx shape facade: TEXT_BOX (17) with .text_frame, TABLE
    (19) with .table.rows/.columns/.cell(i,j), GROUP (6) with .shapes —
    the three branches ppt_parser.py:20-39 dispatches on."""

    def __init__(self, el):
        self.top, self.left = _ppt_off(el)
        self.has_text_frame = False
        if el.tag == f"{_P}grpSp":
            self.shape_type = 6
            self.shapes = [
                _Shape(c) for c in el
                if c.tag in (f"{_P}sp", f"{_P}graphicFrame", f"{_P}grpSp")
            ]
        elif el.tag == f"{_P}graphicFrame":
            self.shape_type = 19
            self.table = _PptTable(el.find(f".//{_A}tbl"))
        else:
            self.shape_type = 17
            body = el.find(f"{_P}txBody")
            if body is not None:
                self.has_text_frame = True
                self.text_frame = _TextFrame(_ppt_body_text(body))


class _PptTable:
    def __init__(self, tbl):
        self.columns = (tbl.findall(f"{_A}tblGrid/{_A}gridCol")
                        if tbl is not None else [])
        self._grid = [
            [_TextFrame(_ppt_body_text(tc.find(f"{_A}txBody"))
                        if tc.find(f"{_A}txBody") is not None else "")
             for tc in tr.findall(f"{_A}tc")]
            for tr in (tbl.findall(f"{_A}tr") if tbl is not None else [])
        ]
        self.rows = self._grid

    def cell(self, i, j):
        return self._grid[i][j]


class _Slide:
    def __init__(self, shapes):
        self.shapes = shapes


class Presentation:
    def __init__(self, src):
        blob = src.read() if hasattr(src, "read") else open(src, "rb").read()
        zf = zipfile.ZipFile(BytesIO(blob))
        slide_files = sorted(
            (n for n in zf.namelist()
             if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda p: int(re.search(r"(\d+)", p).group(1)),
        )
        self.slides = []
        for path in slide_files:
            root = ET.fromstring(zf.read(path))
            tree = root.find(f"{_P}cSld/{_P}spTree")
            shapes = [
                _Shape(el) for el in (tree if tree is not None else [])
                if el.tag in (f"{_P}sp", f"{_P}graphicFrame", f"{_P}grpSp")
            ]
            self.slides.append(_Slide(shapes))


# ------------------------------------------------ aspose.slides thumbnail


class _Thumb:
    def save(self, buf, fmt=None):
        buf.write(b"\xff\xd8fakejpeg")


class _AsposeSlide:
    def get_thumbnail(self, sx, sy):
        return _Thumb()


class AsposePresentation:
    """aspose.slides.Presentation context manager (presentation.py:34-40):
    only len(slides) and per-slide thumbnails are consumed."""

    def __init__(self, src):
        n = len(Presentation(src).slides)
        self.slides = [_AsposeSlide() for _ in range(n)]

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
