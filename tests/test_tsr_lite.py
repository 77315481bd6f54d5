"""TSR-lite tests: grid inference, header vote, renders, caption pairing,
cross-page merge, and the end-to-end PDF → table-chunk path."""

from ragflow_spark.core import pdf_mini, tsr_lite
from ragflow_spark.core.pdf_layout import layout_parse
from ragflow_spark.core.templates import run_template


def _box(text, x0, top, w=40.0, h=12.0, page=1):
    return {"text": text, "x0": x0, "x1": x0 + w, "top": top,
            "bottom": top + h, "page_number": page}


def _grid_boxes(rows, x_cols=(72, 200, 330, 460), y0=100, dy=15, page=1):
    out = []
    for rn, row in enumerate(rows):
        for cn, cell in enumerate(row):
            if cell is not None:
                out.append(_box(cell, x_cols[cn], y0 + rn * dy, page=page))
    return out


HEADER = ["orderkey", "price", "shipdate", "flag"]
DATA = [
    ["1", "33078.94", "1996-03-13", "N"],
    ["2", "38306.16", "1997-01-28", "A"],
    ["3", "15479.68", "1994-02-02", "R"],
]


def test_grid_rows_cols_and_numeric_header_vote():
    cap, tbl, hdset, max_type = tsr_lite.table_grid(
        _grid_boxes([HEADER] + DATA), is_english=True
    )
    assert cap == ""
    assert len(tbl) == 4 and len(tbl[0]) == 4
    assert max_type == "Nu"          # prices/dates/ids dominate
    assert hdset == {0}              # the all-text row wins the header vote
    assert tbl[1][1][0]["text"] == "33078.94"
    assert tbl[3][2][0]["text"] == "1994-02-02"


def test_block_type_patterns():
    assert tsr_lite.block_type("33078.94") == "Nu"
    assert tsr_lite.block_type("1996-03-13") == "Dt"
    assert tsr_lite.block_type("2024年3月5日") == "Dt"
    assert tsr_lite.block_type("orderkey") == "En"
    assert tsr_lite.block_type("N") == "Ca"   # uppercase-code class wins
    assert tsr_lite.block_type("§") == "Sg"
    # lowercase sentences match the En class (space is in its char set) —
    # same as the reference; Tx needs punctuation that defeats every regex
    assert tsr_lite.block_type("this is a short sentence of words ok") == "En"
    assert tsr_lite.block_type("Contains punctuation. And two sentences!") == "Tx"


def test_desc_render_headers_and_caption():
    boxes = _grid_boxes([HEADER] + DATA)
    boxes.insert(0, _box("Table 1: lineitem sample", 72, 80, w=200))
    rows = tsr_lite.construct_table(boxes, is_english=True, html=False)
    assert rows[0].startswith("orderkey：1; price：33078.94; shipdate：1996-03-13; flag：N")
    assert rows[0].endswith("\t—— in “Table 1: lineitem sample”")
    assert len(rows) == 3


def test_html_render_th_td():
    boxes = _grid_boxes([HEADER] + DATA)
    html = tsr_lite.construct_table(boxes, is_english=True, html=True)
    assert html.startswith("<table>")
    assert "<th  >orderkey</th>" in html
    assert "<td  >33078.94</td>" in html
    assert html.count("<tr>") == 4


def test_caption_pairs_to_nearest_table():
    t1 = _grid_boxes([HEADER] + DATA, y0=100)
    t2 = _grid_boxes([HEADER] + DATA, y0=500)
    cap = _box("Table 2: the far one", 72, 470, w=150)
    body = _box("Ordinary body text without caption shape.", 72, 300, w=300)
    rest = tsr_lite.pair_captions([t1, t2], [cap, body])
    assert rest == [body]
    assert t2[0]["text"] == "Table 2: the far one"
    assert all(b["text"] != "Table 2: the far one" for b in t1)


def test_cross_page_merge():
    # window-local cumulative-Y coords: page 2 sits 792 below page 1
    bottom_half = _grid_boxes([HEADER] + DATA, y0=740, page=1)
    top_half = _grid_boxes(DATA, y0=72 + 792, page=2)
    far_table = _grid_boxes([HEADER] + DATA, y0=500 + 792, page=2)
    merged = tsr_lite.merge_cross_page_tables(
        [bottom_half, top_half, far_table], [12.0, 12.0]
    )
    assert len(merged) == 2
    assert len(merged[0]) == len(bottom_half) - len(DATA) * 4 + len(DATA) * 8 \
        or len(merged[0]) == 28  # 4 header + 3 rows + 3 continuation rows ×4


def test_detect_regions_splits_text_from_table():
    page = (
        [_box(f"body line {i} with enough words", 72, 72 + i * 13, w=300)
         for i in range(4)]
        + _grid_boxes([HEADER] + DATA, y0=200)
        + [_box("trailing paragraph text here", 72, 300, w=300)]
    )
    regions, rest = tsr_lite.detect_table_regions(page)
    assert len(regions) == 1 and len(regions[0]) == 16
    assert len(rest) == 5


def test_end_to_end_pdf_table_chunk_first():
    items = [(72.0, 700.0, "Intro paragraph before the table appears here.")]
    # caption + 4-row table in PDF bottom-up coords (y = 792 - top - size)
    items.append((72.0, 630.0, "Table 1: sample data"))
    ys = [600.0, 585.0, 570.0, 555.0]
    xcols = [72.0, 200.0, 330.0, 460.0]
    grid = [HEADER] + DATA
    for rn, row in enumerate(grid):
        for cn, cell in enumerate(row):
            items.append((xcols[cn], ys[rn], cell))
    items.append((72.0, 500.0, "Closing paragraph after the table ends."))
    blob = pdf_mini.build_positioned_pdf([items])

    secs, tbls = layout_parse(blob, return_tables=True)
    assert len(tbls) == 1
    html, tag = tbls[0]
    assert html.startswith("<table><caption>Table 1: sample data</caption>")
    assert "<th  >orderkey</th>" in html and "<td  >33078.94</td>" in html
    texts = [t for t, _ in secs]
    assert any("Intro paragraph" in t for t in texts)
    assert any("Closing paragraph" in t for t in texts)
    assert not any("orderkey" in t for t in texts)

    cks = run_template("naive", blob, "pdf")
    assert cks[0].chunk_text.startswith("<table><caption>")
    assert cks[0].spans and cks[0].spans[0].page == 0
    assert any("Intro paragraph" in c.chunk_text for c in cks[1:])


# ------------------------------------------------- span inference (round 3)

def test_colspan_wide_header_cell():
    boxes = [
        # one box physically spanning both columns (merged header cell)
        {"text": "Results Summary", "x0": 50, "x1": 250, "top": 10,
         "bottom": 22, "page_number": 1},
        _box("metric", 50, 30, w=90), _box("value", 160, 30, w=90),
        _box("speed", 50, 50, w=90), _box("123", 160, 50, w=90),
        _box("size", 50, 70, w=90), _box("456", 160, 70, w=90),
    ]
    html = tsr_lite.construct_table(boxes, is_english=True, html=True)
    assert "colspan=2" in html
    assert html.count("Results Summary") == 1
    # the spanned-away position emits no empty cell
    first_row = [ln for ln in html.split("\n") if "Results Summary" in ln][0]
    assert "<td></td>" not in first_row and "<th></th>" not in first_row


def test_rowspan_tall_cell():
    boxes = [
        _box("h1", 50, 10, w=90), _box("h2", 160, 10, w=90),
        # col-0 cell physically covering the next two rows
        {"text": "merged", "x0": 50, "x1": 140, "top": 30, "bottom": 62,
         "page_number": 1},
        _box("a", 160, 30, w=90),
        _box("b", 160, 50, w=90),
    ]
    html = tsr_lite.construct_table(boxes, is_english=True, html=True)
    assert "rowspan=2" in html
    assert html.count("merged") == 1


def test_span_free_table_unchanged():
    # regression guard: the pre-span HTML shape (two-space '<td  >') is
    # byte-identical when no cell spans
    boxes = _grid_boxes([HEADER, *DATA])
    html = tsr_lite.construct_table(boxes, is_english=True, html=True)
    assert "colspan" not in html and "rowspan" not in html
    assert "<td  >" in html or "<th  >" in html


def test_desc_render_with_spans_repeats_merged_text():
    boxes = [
        {"text": "Results Summary", "x0": 50, "x1": 250, "top": 10,
         "bottom": 22, "page_number": 1},
        _box("metric", 50, 30, w=90), _box("value", 160, 30, w=90),
        _box("speed", 50, 50, w=90), _box("123", 160, 50, w=90),
        _box("size", 50, 70, w=90), _box("456", 160, 70, w=90),
    ]
    rows = tsr_lite.construct_table(boxes, is_english=True, html=False)
    assert rows  # desc path survives span folding


def test_source_credit_dropped_inside_table_region_only():
    """F7 second tier (pdf_parser.py:644-647): the ANCHORED
    (数据|资料|图表)*来源[:： ] pattern drops boxes at table-collection
    time — scoped to detector table regions. A matching line in body
    flow is untouched by this tier (the global garbage bank has its own,
    narrower pattern), and 图表来源/space-colon forms — which the bank
    does NOT match — are dropped here."""
    credit_row = ["图表来源: Wind", "p.12", None, None]  # 2 cells → tabular
    page = (
        [_box("body paragraph mentioning 图表来源: something", 72, 60,
              w=300)]
        + _grid_boxes([HEADER] + DATA + [credit_row], y0=200)
    )
    regions, rest = tsr_lite.detect_table_regions(page)
    assert len(regions) == 1
    texts = [b["text"] for b in regions[0]]
    assert "图表来源: Wind" not in texts      # credit box dropped …
    assert "p.12" in texts                    # … its row-mate survives
    assert len(regions[0]) == 17              # 16 grid + p.12
    # the body-flow line is NOT dropped by this tier
    assert any("body paragraph" in b["text"] for b in rest)
    # anchored: credit mid-text does not match
    assert not tsr_lite.is_source_credit("see 数据来源: xyz")
    assert tsr_lite.is_source_credit("数据来源 Wind")   # space-colon form
    assert tsr_lite.is_source_credit("来源： Wind")     # bare 来源 (zero reps)
