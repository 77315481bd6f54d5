"""J1/J6 layout-assignment machinery (proposal-source-agnostic ports of
recognizer.py geometry + layout_recognizer.py tagging)."""

from ragflow_spark.core import layout_assign as LA


def box(text, x0, x1, top, bottom, **kw):
    return {"text": text, "x0": x0, "x1": x1, "top": top,
            "bottom": bottom, **kw}


def region(ty, x0, x1, top, bottom, score=None):
    r = {"type": ty, "x0": x0, "x1": x1, "top": top, "bottom": bottom}
    if score is not None:
        r["score"] = score
    return r


def test_overlapped_area_ratio_and_absolute():
    a = box("", 0, 10, 0, 10)
    b = box("", 5, 15, 0, 10)
    assert LA.overlapped_area(a, b) == 0.5
    assert LA.overlapped_area(a, b, ratio=False) == 50
    assert LA.overlapped_area(a, box("", 20, 30, 0, 10)) == 0


def test_find_overlapped_bisect():
    rows = [box("", 0, 100, i * 20, i * 20 + 10) for i in range(50)]
    probe = box("", 0, 100, 402, 408)  # inside row 20
    assert LA.find_overlapped(probe, rows) == 20
    assert LA.find_overlapped(probe, rows, naive=True) == 20
    assert LA.find_overlapped(box("", 0, 100, 2000, 2001), rows) is None


def test_find_overlapped_with_threshold_tuple_compare():
    regions = [region("text", 0, 100, 0, 100),
               region("text", 0, 100, 90, 200)]
    probe = box("", 0, 100, 85, 115)  # splits 50/50-ish across both
    ii = LA.find_overlapped_with_threshold(probe, regions, thr=0.3)
    assert ii in (0, 1)
    assert LA.find_overlapped_with_threshold(
        box("", 0, 100, 500, 510), regions) is None


def test_layouts_cleanup_score_and_coverage():
    # duplicate same-type regions: higher score survives
    l1 = [region("text", 0, 100, 0, 100, score=0.9),
          region("text", 0, 100, 5, 105, score=0.5)]
    out = LA.layouts_cleanup([], list(l1))
    assert len(out) == 1 and out[0]["score"] == 0.9
    # no scores: the region covering more text area survives
    t = [box("covered", 0, 50, 10, 20)]
    l2 = [region("text", 0, 60, 0, 100), region("text", 55, 100, 5, 105)]
    out2 = LA.layouts_cleanup(t, list(l2))
    assert len(out2) == 2  # not overlapped enough (thr 0.7) → both stay
    # second region only half-covers the text box → the full-coverage
    # region survives (equal coverage would keep the LATER one, as the
    # reference's tie pops i)
    l3 = [region("text", 0, 100, 0, 100), region("text", 25, 100, 2, 102)]
    out3 = LA.layouts_cleanup(t, list(l3))
    assert len(out3) == 1 and out3[0]["top"] == 0


def test_iou_nms_per_class():
    props = [
        {"type": "table", "bbox": [0, 0, 100, 100], "score": 0.9},
        {"type": "table", "bbox": [2, 2, 98, 98], "score": 0.6},   # dup
        {"type": "table", "bbox": [200, 0, 300, 100], "score": 0.7},
        {"type": "text", "bbox": [0, 0, 100, 100], "score": 0.8},  # other cls
    ]
    kept = LA.iou_nms(props)
    kinds = sorted((p["type"], p["score"]) for p in kept)
    assert kinds == [("table", 0.7), ("table", 0.9), ("text", 0.8)]


def test_assign_layouts_tags_drops_and_synthesizes():
    page_boxes = [[
        box("Title line", 100, 500, 40, 55),
        box("body paragraph text", 72, 540, 100, 112),
        box("page footer junk", 72, 540, 760, 772),
        box("mid page footer-typed but positioned high", 72, 540, 300, 312),
    ]]
    page_layouts = [[
        region("title", 90, 510, 35, 60),
        region("text", 60, 550, 90, 130),
        region("footer", 60, 550, 755, 780),
        region("footer", 60, 550, 295, 320),   # footer region mid-page
        region("figure", 200, 400, 400, 500),  # no text inside
    ]]
    out = LA.assign_layouts(page_boxes, page_layouts, page_height=792.0)
    by_text = {b["text"]: b for b in out}
    assert by_text["Title line"]["layout_type"] == "title"
    assert by_text["body paragraph text"]["layout_type"] == "text"
    assert by_text["body paragraph text"]["layoutno"].startswith("text-")
    # true footer dropped; mid-page 'footer' kept via the position exemption
    assert "page footer junk" not in by_text
    assert "mid page footer-typed but positioned high" in by_text
    # text-less figure region synthesized an empty box
    figs = [b for b in out if b.get("layout_type") == "figure"]
    assert len(figs) == 1 and figs[0]["text"] == ""


def test_assign_layouts_cross_page_garbage_sweep():
    # identical footer text on two pages inside footer layouts, one of them
    # position-exempt: the repeated-text sweep still removes both
    pages = [
        [box("repeated footer", 72, 540, 760, 772),
         box(f"body {i}", 72, 540, 100, 112)]
        for i in range(2)
    ]
    layouts = [
        [region("footer", 60, 550, 755, 780),
         region("text", 60, 550, 90, 130)]
        for _ in range(2)
    ]
    out = LA.assign_layouts(pages, layouts)
    texts = [b["text"] for b in out]
    assert "repeated footer" not in texts
    assert "body 0" in texts and "body 1" in texts


def test_heuristic_layouts_end_to_end():
    """Full J1 path with detector-free proposals over a synthetic page:
    tables, headings, header/footer bands and text blocks all land in
    their layout classes."""
    from ragflow_spark.core import pdf_mini

    lines = [
        (72, 770, "Repeated Page Header"),              # top band
        (72, 700, "1. Section heading"),                # title pattern
        (72, 660, "body paragraph first line of text"),
        (72, 646, "body paragraph second line here"),
        # an aligned 3-row/2-col table
        (72, 600, "metric"), (300, 600, "value"),
        (72, 585, "speed"), (300, 585, "120"),
        (72, 570, "size"), (300, 570, "64"),
        (72, 30, "page 1 footer text"),                 # bottom band
    ]
    blob = pdf_mini.build_positioned_pdf([lines])
    page = pdf_mini.extract_boxes(blob)[0]
    props = LA.heuristic_layouts(page, mean_height=12.0)
    types = sorted({p["type"] for p in props})
    assert types == ["footer", "header", "table", "text", "title"]
    out = LA.assign_layouts([page], [props])
    by_text = {b["text"]: b for b in out}
    assert by_text["1. Section heading"]["layout_type"] == "title"
    assert by_text["metric"]["layout_type"] == "table"
    assert by_text["body paragraph first line of text"]["layout_type"] == "text"
    # header/footer-layout boxes drop outright under drop=True
    # (layout_recognizer.py:112-118) — page chrome never reaches the flow
    assert "Repeated Page Header" not in by_text
    assert "page 1 footer text" not in by_text
    # drop=False keeps them, tagged
    kept = {b["text"]: b for b in LA.assign_layouts([page], [props],
                                                    drop=False)}
    assert kept["Repeated Page Header"]["layout_type"] == "header"


def test_assign_chars_to_boxes_j2():
    """J2: chars fold into their overlapping line box; height-mismatched
    chars go to lefted; a space only joins after latin/numeric text."""
    boxes = [
        {"text": "", "x0": 0, "x1": 200, "top": 0, "bottom": 12},
        {"text": "", "x0": 0, "x1": 200, "top": 20, "bottom": 32},
    ]
    def ch(t, x, top, h=10):
        return {"text": t, "x0": x, "x1": x + 6, "top": top,
                "bottom": top + h}
    chars = [
        ch("H", 0, 1), ch("i", 6, 1),
        ch(" ", 12, 1),                 # joins: previous char latin
        ch("y", 18, 1), ch("o", 24, 1),
        ch("大", 0, 21), ch(" ", 6, 21),  # space after CJK: dropped
        ch("字", 12, 21),
        ch("x", 0, 100),                # overlaps nothing → lefted
        ch("T", 50, 1, h=40),           # 40 vs 12 height → lefted
    ]
    out, lefted = LA.assign_chars_to_boxes(chars, boxes, mean_height=12.0)
    assert out[0]["text"] == "Hi yo"
    assert out[1]["text"] == "大字"
    assert {c["text"] for c in lefted} == {"x", "T"}
