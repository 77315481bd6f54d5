"""TSR-lite: heuristic table-structure recognition over text-layer boxes.

A model-free port of the DETERMINISTIC geometry in the reference's table
pipeline — everything downstream of the ONNX detectors:

- grid inference: deepdoc/vision/table_structure_recognizer.py:133-345
  (``construct_table``). Without the model-provided R/C/H/SP box fields,
  every ``b.get("R", ...)`` branch in the reference degrades to its
  pure-geometry fallback — new row when ``top >= running_bottom - 3``, new
  column when ``x0 >= running_right``, headers only from the
  numeric-majority vote — which is exactly what this module implements.
- renders: ``__desc_table`` (natural-language rows,
  table_structure_recognizer.py:395-488) and ``__html_table``
  (table_structure_recognizer.py:350-393), including the latter's
  header-text dedup quirk.
- caption pairing (J4): pdf_parser.py:691-738 — nearest table by squared
  y/x distance, caption box inserted at the front of the table group.
- cross-page table merge (J5): pdf_parser.py:666-686 — consecutive pages,
  vertical gap under 23 × mean height.
- ``is_caption``: table_structure_recognizer.py:92-99, extended with an
  English ``Table/Figure N`` pattern standing in for the layout detector's
  "caption" class (the CJK-only regex is all the reference has model-free).
- ``block_type``: table_structure_recognizer.py:102-130; the rag_tokenizer
  tail (Tx/Lx/Nr) is approximated with whitespace tokens because the huqie
  dictionary is not shippable (absent from the reference repo itself).

Table REGION detection is the one genuinely new heuristic here (the
reference's region proposals come from an ONNX detector,
layout_recognizer.py): a run of ≥ ``MIN_TABLE_ROWS`` consecutive multi-cell
visual lines whose column starts align across lines is a table region.
"""

from __future__ import annotations

import re

_CAPTION_PATTERNS = [
    re.compile(r"[图表]+[ 0-9:：]{2,}"),           # the reference's own
    re.compile(r"(?:Table|Figure|Fig\.?)\s*[0-9]"),  # detector stand-in
]


def is_caption_text(text: str) -> bool:
    return any(p.match(text.strip()) for p in _CAPTION_PATTERNS)


# F7 detector-scoped tier: pdf_parser.py:644-647 drops boxes matching this
# ANCHORED pattern while collecting table-region boxes (a second, stricter
# application on top of the global garbage bank — adds the 图表 alternative
# and the space-after-colon form, and anchors at the start of the box)
_SOURCE_CREDIT = re.compile(r"(数据|资料|图表)*来源[:： ]")


def is_source_credit(text: str) -> bool:
    return bool(_SOURCE_CREDIT.match(text))


_BLOCK_PATTERNS = [
    (r"^(20|19)[0-9]{2}[年/-][0-9]{1,2}[月/-][0-9]{1,2}日*$", "Dt"),
    (r"^(20|19)[0-9]{2}年$", "Dt"),
    (r"^(20|19)[0-9]{2}[年-][0-9]{1,2}月*$", "Dt"),
    (r"^[0-9]{1,2}[月-][0-9]{1,2}日*$", "Dt"),
    (r"^第*[一二三四1-4]季度$", "Dt"),
    (r"^(20|19)[0-9]{2}年*[一二三四1-4]季度$", "Dt"),
    (r"^(20|19)[0-9]{2}[ABCDE]$", "Dt"),
    (r"^[0-9.,+%/ -]+$", "Nu"),
    (r"^[0-9A-Z/\._~-]+$", "Ca"),
    (r"^[A-Z]*[a-z' -]+$", "En"),
    (r"^[0-9.,+-]+[0-9A-Za-z/$￥%<>（）()' -]+$", "NE"),
    (r"^.{1}$", "Sg"),
]


def block_type(text: str) -> str:
    """Cell-type classifier (table_structure_recognizer.py:102-130)."""
    t = text.strip()
    for p, n in _BLOCK_PATTERNS:
        if re.search(p, t):
            return n
    tks = [x for x in t.split() if len(x) > 1]
    if len(tks) > 3:
        return "Tx" if len(tks) < 12 else "Lx"
    return "Ot"


# ------------------------------------------------------- region detection

MIN_TABLE_ROWS = 3
_ALIGN_TOL = 6.0


def _visual_lines(boxes: list[dict]) -> list[list[dict]]:
    """Group boxes into visual lines with the reference's row rule:
    a new line starts when top >= running-bottom - 3
    (table_structure_recognizer.py:162-169)."""
    if not boxes:
        return []
    arr = sorted(boxes, key=lambda b: (b["top"], b["x0"]))
    lines = [[arr[0]]]
    btm = arr[0]["bottom"]
    for b in arr[1:]:
        if b["top"] >= btm - 3:
            btm = b["bottom"]
            lines.append([b])
            continue
        btm = (btm + b["bottom"]) / 2.0
        lines[-1].append(b)
    for ln in lines:
        ln.sort(key=lambda b: b["x0"])
    return lines


def _aligned(a: list[dict], b: list[dict], tol: float = _ALIGN_TOL) -> bool:
    """Column starts of line ``b`` align with line ``a``'s."""
    xa = [box["x0"] for box in a]
    shared = sum(1 for box in b if any(abs(box["x0"] - x) <= tol for x in xa))
    return shared >= 2 and shared * 2 >= max(len(a), len(b))


def detect_table_regions(
    page_boxes: list[dict],
) -> tuple[list[list[dict]], list[dict]]:
    """Split one page's boxes into (table regions, remaining flow).

    A table region is a maximal run of ≥ MIN_TABLE_ROWS consecutive visual
    lines, each with ≥ 2 cells, whose column starts align line-to-line —
    the heuristic stand-in for the ONNX layout detector's "table" regions
    (layout_recognizer.py:73-78)."""
    lines = _visual_lines(page_boxes)
    tabular = [len(ln) >= 2 for ln in lines]
    regions: list[list[dict]] = []
    rest: list[dict] = []
    i = 0
    while i < len(lines):
        if not tabular[i]:
            rest.extend(lines[i])
            i += 1
            continue
        j = i + 1
        while j < len(lines) and tabular[j] and _aligned(lines[j - 1], lines[j]):
            j += 1
        if j - i >= MIN_TABLE_ROWS:
            # pdf_parser.py:644-647: source-credit boxes are dropped at
            # table-collection time (scoped to detector table regions, not
            # the global garbage pass — F7's second tier)
            region = [b for ln in lines[i:j] for b in ln
                      if not is_source_credit(b["text"])]
            if region:  # all-credit region: nothing to collect (the
                # reference's tables[lout_no] is only created by a
                # surviving box)
                regions.append(region)
        else:
            for ln in lines[i:j]:
                rest.extend(ln)
        i = j
    return regions, rest


# -------------------------------------------------- cross-page merge (J5)


def _sort_y(arr: list[dict], thr: float) -> list[dict]:
    """Recognizer.sort_Y_firstly (recognizer.py:65-77): (top, x0) sort with
    adjacent swaps restoring x order when tops differ by less than thr."""
    arr = sorted(arr, key=lambda r: (r["top"], r["x0"]))
    for i in range(len(arr) - 1):
        for j in range(i, -1, -1):
            if abs(arr[j + 1]["top"] - arr[j]["top"]) < thr \
                    and arr[j + 1]["x0"] < arr[j]["x0"]:
                arr[j], arr[j + 1] = arr[j + 1], arr[j]
    return arr


def _y_dis(a: dict, b: dict) -> float:
    return (b["top"] + b["bottom"] - a["top"] - a["bottom"]) / 2


def _x_dis(a: dict, b: dict) -> float:
    return min(abs(a["x1"] - b["x0"]), abs(a["x0"] - b["x1"]),
               abs(a["x0"] + a["x1"] - b["x0"] - b["x1"]) / 2)


def merge_cross_page_tables(
    tables: list[list[dict]], mean_height: list[float]
) -> list[list[dict]]:
    """pdf_parser.py:666-686: walk table groups bottom-up, concatenating a
    group into its predecessor when they sit on consecutive pages and the
    vertical gap (cumulative-Y coordinates) is under 23 × the page's mean
    line height. ``mean_height`` is indexed by window-local page - 1."""
    tbls = sorted(tables, key=lambda bxs: (bxs[0]["top"], bxs[0]["x0"]))
    i = len(tbls) - 1
    while i - 1 >= 0:
        bxs0, bxs = tbls[i - 1], tbls[i]
        i -= 1
        if bxs[0]["page_number"] == bxs0[0]["page_number"]:
            continue
        if bxs[0]["page_number"] - bxs0[0]["page_number"] > 1:
            continue
        mh = mean_height[bxs[0]["page_number"] - 1]
        if _y_dis(bxs0[-1], bxs[0]) > mh * 23:
            continue
        bxs0.extend(bxs)
        tbls.pop(i + 1)
    return tbls


# ------------------------------------------------- caption pairing (J4)


def pair_captions(
    tables: list[list[dict]], boxes: list[dict]
) -> list[dict]:
    """pdf_parser.py:691-738 restricted to tables (no figure tier without a
    detector): each caption-looking box is popped from the text flow and
    inserted at the front of the nearest table group (squared y/x distance;
    x distance is zero when the boxes overlap horizontally). With no tables
    the box stays in the flow — the reference only reaches its
    caption-dropping branch when its detector produced regions."""
    if not tables:
        return boxes

    def x_overlapped(a: dict, b: dict) -> bool:
        return not (a["x1"] < b["x0"] or a["x0"] > b["x1"])

    rest: list[dict] = []
    for c in boxes:
        if not is_caption_text(c["text"]):
            rest.append(c)
            continue
        best, best_d = None, None
        for bxs in tables:
            for b in bxs:
                yd = _y_dis(c, b)
                xd = 0.0 if x_overlapped(c, b) else _x_dis(c, b)
                d = yd * yd + xd * xd
                if best_d is None or d < best_d:
                    best, best_d = bxs, d
        best.insert(0, c)
    return rest


# ----------------------------------------------------- grid construction


def table_grid(boxes: list[dict], is_english: bool = False
               ) -> tuple[str, list[list[list[dict]]], set[int], str]:
    """The deterministic core of ``construct_table``
    (table_structure_recognizer.py:133-345): caption extraction, row/column
    clustering, lone-cell relocation, numeric-majority header vote.

    Returns (caption, tbl[rn][cn] -> list of boxes, header row set,
    majority block type)."""
    cap, tbl, hdset, max_type, _rows, _cols = _table_grid_impl(
        boxes, is_english
    )
    return cap, tbl, hdset, max_type


def _table_grid_impl(boxes: list[dict], is_english: bool = False):
    boxes = list(boxes)
    cap = ""
    i = 0
    while i < len(boxes):
        if is_caption_text(boxes[i]["text"]):
            cap += boxes[i]["text"]
            boxes.pop(i)
            i -= 1
        i += 1
    if not boxes:
        return cap, [], set(), "", [], []

    from collections import Counter

    for b in boxes:
        b["btype"] = block_type(b["text"])
    counts = Counter(b["btype"] for b in boxes).items()
    max_type = max(counts, key=lambda x: x[1])[0] if counts else ""

    # rows: (top, x0) order; new row when top >= running-bottom - 3
    boxes = sorted(boxes, key=lambda b: (b["top"], b["x0"]))
    boxes[0]["rn"] = 0
    rows = [[boxes[0]]]
    btm = boxes[0]["bottom"]
    for b in boxes[1:]:
        b["rn"] = len(rows) - 1
        if b["top"] >= btm - 3:
            btm = b["bottom"]
            b["rn"] += 1
            rows.append([b])
            continue
        btm = (btm + b["bottom"]) / 2.0
        rows[-1].append(b)

    # columns: (x0, top) order; new column when x0 >= running-right
    boxes = sorted(boxes, key=lambda b: (b["x0"], b["top"]))
    boxes[0]["cn"] = 0
    cols = [[boxes[0]]]
    right = boxes[0]["x1"]
    for b in boxes[1:]:
        b["cn"] = len(cols) - 1
        if b["x0"] >= right:
            right = b["x1"]
            b["cn"] += 1
            cols.append([b])
            continue
        right = (right + b["x1"]) / 2.0
        cols[-1].append(b)

    tbl: list[list[list[dict]]] = [
        [[] for _ in range(len(cols))] for _ in range(len(rows))
    ]
    for b in boxes:
        tbl[b["rn"]][b["cn"]].append(b)

    _relocate_singles(tbl, rows, cols)

    # header vote (table_structure_recognizer.py:330-343): without the
    # model's H flag, only the numeric-majority signal remains
    hdset: set[int] = set()
    for r in range(len(tbl)):
        cnt, h = 0, 0
        for arr in tbl[r]:
            if not arr:
                continue
            cnt += 1
            if max_type == "Nu" and arr[0]["btype"] == "Nu":
                continue
            if max_type == "Nu" and arr[0]["btype"] != "Nu":
                h += 1
        if cnt and h / cnt > 0.5:
            hdset.add(r)
    return cap, tbl, hdset, max_type, rows, cols


def _relocate_singles(tbl, rows, cols) -> None:
    """The "remove single in column/row" passes
    (table_structure_recognizer.py:200-290): a column (when ≥4 rows) or row
    (when ≥4 cols) holding exactly one non-empty cell whose neighbors are
    empty merges into the nearer neighbor."""
    if len(rows) >= 4 and tbl and tbl[0]:
        j = 0
        while j < len(tbl[0]):
            e, ii = 0, 0
            for i in range(len(tbl)):
                if tbl[i][j]:
                    e += 1
                    ii = i
                if e > 1:
                    break
            if e > 1:
                j += 1
                continue
            f = (j > 0 and tbl[ii][j - 1] and tbl[ii][j - 1][0].get("text")) or j == 0
            ff = (j + 1 < len(tbl[ii]) and tbl[ii][j + 1]
                  and tbl[ii][j + 1][0].get("text")) or j + 1 >= len(tbl[ii])
            if f and ff:
                j += 1
                continue
            bx = tbl[ii][j][0]
            left, right = 100000.0, 100000.0
            if j > 0 and not f:
                for i in range(len(tbl)):
                    if tbl[i][j - 1]:
                        left = min(left, min(bx["x0"] - a["x1"] for a in tbl[i][j - 1]))
            if j + 1 < len(tbl[0]) and not ff:
                for i in range(len(tbl)):
                    if tbl[i][j + 1]:
                        right = min(right, min(a["x0"] - bx["x1"] for a in tbl[i][j + 1]))
            if left < right:
                tgt = j - 1
            else:
                tgt = j + 1
            for jj in range(min(tgt + 1, j + 1), len(tbl[0])):
                for i in range(len(tbl)):
                    for a in tbl[i][jj]:
                        a["cn"] -= 1
            if tbl[ii][tgt]:
                tbl[ii][tgt].extend(tbl[ii][j])
            else:
                tbl[ii][tgt] = tbl[ii][j]
            for i in range(len(tbl)):
                tbl[i].pop(j)
            cols.pop(j)

    if tbl and len(tbl[0]) >= 4:
        i = 0
        while i < len(tbl):
            e, jj = 0, 0
            for j in range(len(tbl[i])):
                if tbl[i][j]:
                    e += 1
                    jj = j
                if e > 1:
                    break
            if e > 1:
                i += 1
                continue
            f = (i > 0 and tbl[i - 1][jj] and tbl[i - 1][jj][0].get("text")) or i == 0
            ff = (i + 1 < len(tbl) and tbl[i + 1][jj]
                  and tbl[i + 1][jj][0].get("text")) or i + 1 >= len(tbl)
            if f and ff:
                i += 1
                continue
            bx = tbl[i][jj][0]
            up, down = 100000.0, 100000.0
            if i > 0 and not f:
                for j in range(len(tbl[i - 1])):
                    if tbl[i - 1][j]:
                        up = min(up, min(bx["top"] - a["bottom"] for a in tbl[i - 1][j]))
            if i + 1 < len(tbl) and not ff:
                for j in range(len(tbl[i + 1])):
                    if tbl[i + 1][j]:
                        down = min(down, min(a["top"] - bx["bottom"] for a in tbl[i + 1][j]))
            tgt = i - 1 if up < down else i + 1
            if tbl[tgt][jj]:
                tbl[tgt][jj].extend(tbl[i][jj])
            else:
                tbl[tgt][jj] = tbl[i][jj]
            tbl.pop(i)
            rows.pop(i)


# ------------------------------------------------------- span inference


def _centers(groups: list[list[dict]], lo_key: str, hi_key: str
             ) -> tuple[list[float], list[float]]:
    lo = [sum(c[lo_key] for c in g) / len(g) for g in groups]
    hi = [sum(c[hi_key] for c in g) / len(g) for g in groups]
    return lo, hi


def mark_spanning(boxes: list[dict], rows: list[list[dict]],
                  cols: list[list[dict]]) -> None:
    """Detector-free stand-in for the TSR model's 'spanning cell' class
    (pdf_parser.py:270-275 sets SP/H_* from detected span regions): a text
    box whose own extent covers the centers of ≥2 columns or ≥2 rows IS a
    merged cell in the rendered PDF, and its box is the span region."""
    clft, crgt = _centers(cols, "x0", "x1")
    rtop, rbtm = _centers(rows, "top", "bottom")
    for b in boxes:
        ncols = sum(
            1 for j in range(len(cols))
            if b["x0"] <= clft[j] + (crgt[j] - clft[j]) / 2 <= b["x1"]
        )
        nrows = sum(
            1 for j in range(len(rows))
            if b["top"] <= rtop[j] + (rbtm[j] - rtop[j]) / 2 <= b["bottom"]
        )
        if ncols >= 2 or nrows >= 2:
            b["SP"] = 1
            b["H_left"], b["H_right"] = b["x0"], b["x1"]
            b["H_top"], b["H_bott"] = b["top"], b["bottom"]


def cal_spans(boxes: list[dict], rows: list[list[dict]],
              cols: list[list[dict]], tbl: list[list], html: bool = True
              ) -> list[list]:
    """``__cal_spans`` (table_structure_recognizer.py:500-584): for each
    SP-tagged box, its colspan covers every column whose center falls in
    [H_left, H_right] (rows likewise); spanned cells merge into the span's
    top-left position, becoming None (html render skips them) or sharing
    the merged array (desc render repeats it), with rowspan/colspan counts
    written onto the boxes for the HTML attributes."""
    clft, crgt = _centers(cols, "x0", "x1")
    rtop, rbtm = _centers(rows, "top", "bottom")
    for b in boxes:
        if "SP" not in b:
            continue
        b["colspan"] = [b["cn"]]
        b["rowspan"] = [b["rn"]]
        for j in range(len(clft)):
            if j == b["cn"]:
                continue
            if clft[j] + (crgt[j] - clft[j]) / 2 < b["H_left"]:
                continue
            if crgt[j] - (crgt[j] - clft[j]) / 2 > b["H_right"]:
                continue
            b["colspan"].append(j)
        for j in range(len(rtop)):
            if j == b["rn"]:
                continue
            if rtop[j] + (rbtm[j] - rtop[j]) / 2 < b["H_top"]:
                continue
            if rbtm[j] - (rbtm[j] - rtop[j]) / 2 > b["H_bott"]:
                continue
            b["rowspan"].append(j)

    def join(arr):
        return "".join(t["text"] for t in arr) if arr else ""

    for i in range(len(tbl)):
        for j, arr in enumerate(tbl[i]):
            if not arr:
                continue
            if all("rowspan" not in a and "colspan" not in a for a in arr):
                continue
            rowspan, colspan = [], []
            for a in arr:
                if isinstance(a.get("rowspan", 0), list):
                    rowspan.extend(a["rowspan"])
                if isinstance(a.get("colspan", 0), list):
                    colspan.extend(a["colspan"])
            rowspan, colspan = set(rowspan), set(colspan)
            if len(rowspan) < 2 and len(colspan) < 2:
                for a in arr:
                    a.pop("rowspan", None)
                    a.pop("colspan", None)
                continue
            # relocation passes can leave rn/cn stale; the reference
            # asserts here (tsr:566-567) — include the actual position
            # instead so a heuristic region degrades, not dies
            rowspan.add(i)
            colspan.add(j)
            rowspan, colspan = sorted(rowspan), sorted(colspan)
            rowspan = list(range(rowspan[0], rowspan[-1] + 1))
            colspan = list(range(colspan[0], colspan[-1] + 1))
            rowspan = [r for r in rowspan if r < len(tbl)]
            colspan = [c for c in colspan if c < len(tbl[i])]
            arr = []
            for r in rowspan:
                for c in colspan:
                    arr_txt = join(arr)
                    if tbl[r][c] and join(tbl[r][c]) != arr_txt:
                        arr.extend(tbl[r][c])
                    tbl[r][c] = None if html else arr
            for a in arr:
                if len(rowspan) > 1:
                    a["rowspan"] = len(rowspan)
                else:
                    a.pop("rowspan", None)
                if len(colspan) > 1:
                    a["colspan"] = len(colspan)
                else:
                    a.pop("colspan", None)
            tbl[rowspan[0]][colspan[0]] = arr
    return tbl


# -------------------------------------------------------------- renders


def render_html_table(cap: str, hdset: set[int],
                      tbl: list[list[list[dict]]]) -> str:
    """``__html_table`` (table_structure_recognizer.py:350-393) including
    colspan/rowspan attributes (``cal_spans`` sets them; spanned positions
    arrive as None and are skipped). The reference's quirk of adding header
    TEXTS into the header-row-index set (so a repeated header row is
    skipped) is kept."""
    hdset = set(hdset)
    html = "<table>"
    if cap:
        html += f"<caption>{cap}</caption>"
    for i in range(len(tbl)):
        row = "<tr>"
        txts = []
        for arr in tbl[i]:
            if arr is None:
                continue
            if not arr:
                row += "<td></td>" if i not in hdset else "<th></th>"
                continue
            h = min(min(c["bottom"] - c["top"] for c in arr) / 2, 10)
            txt = " ".join(c["text"] for c in _sort_y(arr, h))
            txts.append(txt)
            # span attributes exactly as __html_table (tsr:372-379); with
            # no spans sp == "" and the cell renders "<td  >" as before
            sp = ""
            if arr[0].get("colspan"):
                sp = "colspan={}".format(arr[0]["colspan"])
            if arr[0].get("rowspan"):
                sp += " rowspan={}".format(arr[0]["rowspan"])
            if i in hdset:
                row += f"<th {sp} >" + txt + "</th>"
            else:
                row += f"<td {sp} >" + txt + "</td>"
        if i in hdset:
            if all(t in hdset for t in txts):
                continue
            for t in txts:
                hdset.add(t)
        row = row + "</tr>" if row != "<tr>" else ""
        html += "\n" + row
    html += "\n</table>"
    return html


def render_desc_table(cap: str, hdr_rowno: set[int],
                      tbl: list[list[list[dict]]], is_english: bool) -> list[str]:
    """``__desc_table`` (table_structure_recognizer.py:395-488): header rows
    compose per-column labels (multi-row headers concatenate with 的/' for '),
    data rows render as 'header：value; …' lines; headerless ≤2-column
    tables pack '：'-joined rows into ≤64-char lines; a caption appends
    ``\\t——in "cap"``."""
    if not tbl:
        return []
    hdr_rowno = set(hdr_rowno)
    clmno = len(tbl[0])
    rowno = len(tbl)
    headers: dict[int, list[str]] = {}
    lst_hdr: list[str] = []
    de = "的" if not is_english else " for "
    for r in sorted(hdr_rowno):
        headers[r] = ["" for _ in range(clmno)]
        for i in range(clmno):
            if not tbl[r][i]:
                continue
            headers[r][i] = " ".join(a["text"].strip() for a in tbl[r][i])
        if all(not t for t in headers[r]):
            del headers[r]
            hdr_rowno.remove(r)
            continue
        for j in range(clmno):
            if headers[r][j]:
                continue
            if j >= len(lst_hdr):
                break
            headers[r][j] = lst_hdr[j]
        lst_hdr = headers[r]
    for i in range(rowno):
        if i not in hdr_rowno:
            continue
        for j in range(i + 1, rowno):
            if j not in hdr_rowno:
                break
            for k in range(clmno):
                if not headers[j - 1][k]:
                    continue
                if headers[j][k].find(headers[j - 1][k]) >= 0:
                    continue
                if len(headers[j][k]) > len(headers[j - 1][k]):
                    headers[j][k] += (de if headers[j][k] else "") + headers[j - 1][k]
                else:
                    headers[j][k] = headers[j - 1][k] \
                        + (de if headers[j - 1][k] else "") + headers[j][k]

    row_txt: list[str] = []
    for i in range(rowno):
        if i in hdr_rowno:
            continue
        rtxt: list[str] = []

        def append(delimer):
            nonlocal rtxt, row_txt
            joined = delimer.join(rtxt)
            if row_txt and len(row_txt[-1]) + len(joined) < 64:
                row_txt[-1] += "\n" + joined
            else:
                row_txt.append(joined)

        r = 0
        if headers:
            _arr = [(i - r0, r0) for r0 in headers if r0 < i]
            if _arr:
                _, r = min(_arr, key=lambda x: x[0])
        if r not in headers and clmno <= 2:
            for j in range(clmno):
                if not tbl[i][j]:
                    continue
                txt = "".join(a["text"].strip() for a in tbl[i][j])
                if txt:
                    rtxt.append(txt)
            if rtxt:
                append("：")
            continue
        for j in range(clmno):
            if not tbl[i][j]:
                continue
            txt = "".join(a["text"].strip() for a in tbl[i][j])
            if not txt:
                continue
            ctt = headers[r][j] if r in headers else ""
            if ctt:
                ctt += "："
            ctt += txt
            if ctt:
                rtxt.append(ctt)
        if rtxt:
            row_txt.append("; ".join(rtxt))

    if cap:
        from_ = " in " if is_english else "来自"
        row_txt = [t + f"\t——{from_}“{cap}”" for t in row_txt]
    return row_txt


def construct_table(boxes: list[dict], is_english: bool = False,
                    html: bool = False):
    """``TableStructureRecognizer.construct_table`` on the model-free path:
    returns the HTML string (html=True, the naive/paper/book PDF contract,
    rag/app/naive.py:148) or the natural-language row list. Merged cells
    are detected geometrically (``mark_spanning``) and folded by the
    ``cal_spans`` port, so wide header cells render with
    colspan=/rowspan= exactly like the reference (tsr:339-348)."""
    cap, tbl, hdset, _max_type, rows, cols = _table_grid_impl(
        boxes, is_english
    )
    if not tbl:
        return "" if html else []
    cells = [b for row in rows for b in row]
    mark_spanning(cells, rows, cols)
    tbl = cal_spans(cells, rows, cols, tbl, html=html)
    if html:
        return render_html_table(cap, hdset, tbl)
    return render_desc_table(cap, hdset, tbl, is_english)


def pdf_tables_cells(blob: bytes, is_english: bool = True
                     ) -> list[tuple[str, list[list[str]]]]:
    """Blob-level convenience: text-layer boxes → region detection → caption
    pairing → one (caption, cell grid) per table, in page/top order."""
    from ragflow_spark.core import pdf_mini

    regions: list[list[dict]] = []
    rest: list[dict] = []
    for page in pdf_mini.extract_boxes(blob):
        regs, others = detect_table_regions(page)
        regions.extend(regs)
        rest.extend(others)
    pair_captions(regions, rest)
    return [table_cells(bxs, is_english) for bxs in regions]


def table_cells(boxes: list[dict], is_english: bool = True
                ) -> tuple[str, list[list[str]]]:
    """(caption, grid of cell texts) — the typed-cell output the oracle
    checks; cell text joins its boxes in (top, x0) order."""
    cap, tbl, _hdset, _mt = table_grid(boxes, is_english)
    grid = [
        [
            " ".join(
                c["text"]
                for c in _sort_y(arr, min(min(x["bottom"] - x["top"] for x in arr) / 2, 10))
            ) if arr else ""
            for arr in row
        ]
        for row in tbl
    ]
    return cap, grid
