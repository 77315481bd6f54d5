"""The `table` parser template (rag/app/table.py): every spreadsheet/CSV
row becomes one chunk of ``header:value; ...`` pairs, with per-column type
inference (int/float/bool/datetime/text majority vote) TRANSFORMING the
values first — ints print bare, bools normalize to yes/no, datetimes to
'%Y-%m-%d %H:%M:%S' via dateutil (public, ships with pandas).

The reference additionally derives an ES field map (pinyin-romanized
column names + type suffixes) and pushes it to the knowledge-base service
(table.py:203-236); that mapping never reaches chunk text and the
service/pinyin tier is out of scope per SURVEY §2.9 — the distributed
analog of the type vote is ``operators/tables.column_type_votes``.

Production splits table files into 3000-row tasks
(api/db/services/task_service.py:188-196); ``from_page``/``to_page`` here
are ROW indices exactly like the reference's.
"""

from __future__ import annotations

import re

from ragflow_spark.core.codec import decode_bytes

_BOOL_TRUE = re.compile(r"(true|yes|是|\*|✓|✔|☑|✅|√)$", re.IGNORECASE)
_BOOL_FALSE = re.compile(r"(false|no|否|⍻|×)$", re.IGNORECASE)
_BOOL_ANY = re.compile(r"(true|yes|是|\*|✓|✔|☑|✅|√|false|no|否|⍻|×)$",
                       re.IGNORECASE)
_INT = re.compile(r"[+-]?[0-9]+(\.0+)?$")
_FLOAT = re.compile(r"[+-]?[0-9.]+$")


def trans_datetime(s: str):
    """table.py:74-78: dateutil parse → fixed format, None on failure."""
    try:
        from dateutil.parser import parse as datetime_parse

        return datetime_parse(s.strip()).strftime("%Y-%m-%d %H:%M:%S")
    except Exception:
        return None


def trans_bool(s):
    if _BOOL_TRUE.match(str(s).strip()):
        return "yes"
    if _BOOL_FALSE.match(str(s).strip()):
        return "no"
    return None


def column_data_type(arr: list):
    """table.py:89-121: majority type vote over the column, then transform
    every cell to the voted type (failures → None)."""
    counts = {"int": 0, "float": 0, "text": 0, "datetime": 0, "bool": 0}
    trans = {"int": int, "float": float, "datetime": trans_datetime,
             "bool": trans_bool, "text": str}
    for a in arr:
        if a is None:
            continue
        s = str(a).replace("%%", "")
        if _INT.match(s):
            counts["int"] += 1
        elif _FLOAT.match(s):
            counts["float"] += 1
        elif _BOOL_ANY.match(str(a)):
            counts["bool"] += 1
        elif trans_datetime(str(a)):
            counts["datetime"] += 1
        else:
            counts["text"] += 1
    ty = sorted(counts.items(), key=lambda x: -x[1])[0][0]
    out = list(arr)
    for i in range(len(out)):
        if out[i] is None:
            continue
        try:
            out[i] = trans[ty](str(out[i]))
        except Exception:
            out[i] = None
    return out, ty


def _frames(blob: bytes, fmt: str, from_page: int, to_page: int,
            delimiter: str = "\t"):
    """(headers, rows) frames per the reference's Excel/csv readers
    (table.py:28-72,139-169): None headers drop their column, ragged rows
    drop, row windowing is GLOBAL across sheets for xlsx and line-based
    for csv."""
    frames = []
    if fmt in ("xlsx", "xls"):
        from ragflow_spark.core.office import _xlsx_sheets

        rn = 0
        for _name, rows in _xlsx_sheets(blob):
            if not rows:
                continue
            headers_all = list(rows[0])
            missed = {i for i, h in enumerate(headers_all) if h is None}
            headers = [h for i, h in enumerate(headers_all)
                       if i not in missed]
            if not headers:
                continue
            data = []
            for r in rows[1:]:
                rn += 1
                if rn - 1 < from_page:
                    continue
                if rn - 1 >= to_page:
                    break
                row = [c for ii, c in enumerate(r) if ii not in missed]
                if len(row) != len(headers):
                    continue
                data.append(row)
            frames.append((headers, data))
    else:
        lines = decode_bytes(blob).split("\n")
        if not lines:
            return frames
        headers = lines[0].split(delimiter)
        rows = []
        for i, line in enumerate(lines[1:]):
            if i < from_page:
                continue
            if i >= to_page:
                break
            row = line.split(delimiter)
            if len(row) != len(headers):
                continue
            rows.append(row)
        frames.append((headers, rows))
    return frames


def table_rows(blob: bytes, fmt: str, from_page: int = 0,
               to_page: int = 10_000_000_000,
               delimiter: str = "\t") -> list[str]:
    """One ``header:value; ...`` line per kept row (the
    content_with_weight the reference's tokenize() stores,
    table.py:208-231): id/index/idx columns drop, cells transform by the
    column's voted type, empty/None cells skip."""
    out: list[str] = []
    for headers, data in _frames(blob, fmt, from_page, to_page, delimiter):
        keep = [j for j, h in enumerate(headers)
                if str(h) not in ("id", "index", "idx")]
        headers = [headers[j] for j in keep]
        cols = [[row[j] for row in data] for j in keep]
        typed = []
        for c in cols:
            vals, ty = column_data_type(c)
            if ty == "int" and any(v is None for v in vals):
                # pandas quirk the reference inherits (table.py:201):
                # assigning an int column containing None coerces the
                # Series to float64, so 22 prints as 22.0 in row_txt
                vals = [float(v) if v is not None else None for v in vals]
            typed.append(vals)
        for i in range(len(data)):
            row_txt = []
            for j, h in enumerate(headers):
                v = typed[j][i] if i < len(typed[j]) else None
                if v is None or not str(v):
                    continue
                row_txt.append("{}:{}".format(h, v))
            if row_txt:
                out.append("; ".join(row_txt))
    return out
