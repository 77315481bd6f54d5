"""J1/J2/J6: the deterministic box↔layout machinery downstream of the
layout detector, rebuilt so ANY region-proposal source plugs in — the
heuristic proposals this engine generates today, or a real ONNX layout
model's output when weights exist. Only the proposals are model-blocked
in the reference (deepdoc/vision/layout_recognizer.py:46-48 downloads
them); everything in this module is published geometry/bookkeeping:

- ``overlapped_area``             recognizer.py:135-153
- ``find_overlapped``             recognizer.py:240-272 (y-bisect + argmax)
- ``find_overlapped_with_threshold``  recognizer.py:288-302
- ``find_horizontally_tightest_fit``  recognizer.py:275-285
- ``layouts_cleanup``             recognizer.py:156-197 (J6 region dedup:
  score tie-break, else text-coverage tie-break)
- ``iou_nms``                     recognizer.py:360-400 (per-class IoU NMS
  over proposal arrays — the YOLO-head half of J6)
- ``assign_layouts``              layout_recognizer.py:68-151 (J1: tag
  every text box with layoutno/layout_type, drop garbage-layout boxes
  with the header/footer position exemptions, synthesize empty boxes for
  text-less figure regions, and the cross-page repeated-garbage sweep)
"""

from __future__ import annotations

from collections import Counter
from copy import deepcopy

GARBAGE_LAYOUTS = ["footer", "header", "reference"]

LAYOUT_ORDER = ["footer", "header", "reference", "figure caption",
                "table caption", "title", "table", "text", "figure",
                "equation"]


def overlapped_area(a: dict, b: dict, ratio: bool = True) -> float:
    """Overlap area of a∩b, as a fraction of a's area when ``ratio``
    (recognizer.py:135-153)."""
    tp, btm, x0, x1 = a["top"], a["bottom"], a["x0"], a["x1"]
    if b["x0"] > x1 or b["x1"] < x0:
        return 0
    if b["bottom"] < tp or b["top"] > btm:
        return 0
    x0_, x1_ = max(b["x0"], x0), min(b["x1"], x1)
    tp_, btm_ = max(b["top"], tp), min(b["bottom"], btm)
    ov = (btm_ - tp_) * (x1_ - x0_) if x1 - x0 != 0 and btm - tp != 0 else 0
    if ov > 0 and ratio:
        ov /= (x1 - x0) * (btm - tp)
    return ov


def find_overlapped(box: dict, boxes_sorted_by_y: list[dict],
                    naive: bool = False):
    """Index of the most-overlapping box, y-bisected (recognizer.py:240-272)."""
    if not boxes_sorted_by_y:
        return None
    bxs = boxes_sorted_by_y
    s, e, ii = 0, len(bxs), 0
    while s < e and not naive:
        ii = (e + s) // 2
        pv = bxs[ii]
        if box["bottom"] < pv["top"]:
            e = ii
            continue
        if box["top"] > pv["bottom"]:
            s = ii + 1
            continue
        break
    while s < ii:
        if box["top"] > bxs[s]["bottom"]:
            s += 1
        break
    while e - 1 > ii:
        if box["bottom"] < bxs[e - 1]["top"]:
            e -= 1
        break
    max_i, max_ov = None, 0
    for i in range(s, e):
        ov = overlapped_area(bxs[i], box)
        if ov <= max_ov:
            continue
        max_i, max_ov = i, ov
    return max_i


def find_overlapped_with_threshold(box: dict, boxes: list[dict],
                                   thr: float = 0.3):
    """recognizer.py:288-302 — lexicographic (ov_box_in_b, ov_b_in_box)
    argmax above the threshold, the reference's exact tuple comparison."""
    if not boxes:
        return None
    max_i, max_ov, _max_ov = None, thr, 0
    for i in range(len(boxes)):
        ov = overlapped_area(box, boxes[i])
        _ov = overlapped_area(boxes[i], box)
        if (ov, _ov) < (max_ov, _max_ov):
            continue
        max_i, max_ov, _max_ov = i, ov, _ov
    return max_i


def find_horizontally_tightest_fit(box: dict, boxes: list[dict]):
    """recognizer.py:275-285 — same-layoutno column with the closest
    left/right/center alignment."""
    if not boxes:
        return None
    min_dis, min_i = 1000000, None
    for i, b in enumerate(boxes):
        if box.get("layoutno", "0") != b.get("layoutno", "0"):
            continue
        dis = min(abs(box["x0"] - b["x0"]), abs(box["x1"] - b["x1"]),
                  abs(box["x0"] + box["x1"] - b["x1"] - b["x0"]) / 2)
        if dis < min_dis:
            min_i, min_dis = i, dis
    return min_i


def layouts_cleanup(boxes: list[dict], layouts: list[dict],
                    far: int = 2, thr: float = 0.7) -> list[dict]:
    """J6 region dedup (recognizer.py:156-197): near-identical same-type
    regions collapse — higher score wins; with no scores, the region
    covering more text-box area wins. Mutates and returns ``layouts``."""

    def not_overlapped(a, b):
        return any([a["x1"] < b["x0"], a["x0"] > b["x1"],
                    a["bottom"] < b["top"], a["top"] > b["bottom"]])

    i = 0
    while i + 1 < len(layouts):
        j = i + 1
        while j < min(i + far, len(layouts)) \
                and (layouts[i].get("type", "") != layouts[j].get("type", "")
                     or not_overlapped(layouts[i], layouts[j])):
            j += 1
        if j >= min(i + far, len(layouts)):
            i += 1
            continue
        if overlapped_area(layouts[i], layouts[j]) < thr \
                and overlapped_area(layouts[j], layouts[i]) < thr:
            i += 1
            continue
        if layouts[i].get("score") and layouts[j].get("score"):
            if layouts[i]["score"] > layouts[j]["score"]:
                layouts.pop(j)
            else:
                layouts.pop(i)
            continue
        area_i, area_j = 0, 0
        for b in boxes:
            if not not_overlapped(b, layouts[i]):
                area_i += overlapped_area(b, layouts[i], False)
            if not not_overlapped(b, layouts[j]):
                area_j += overlapped_area(b, layouts[j], False)
        if area_i > area_j:
            layouts.pop(j)
        else:
            layouts.pop(i)
    return layouts


def iou_nms(proposals: list[dict], iou_threshold: float = 0.2) -> list[dict]:
    """Per-class IoU NMS over {type, bbox [x0,y0,x1,y1], score} proposals
    (recognizer.py:360-400 iou_filter per unique class) — pure-python port
    (the proposal counts here are per page, double digits)."""

    def iou(a, b):
        xmin, ymin = max(a[0], b[0]), max(a[1], b[1])
        xmax, ymax = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0, xmax - xmin) * max(0, ymax - ymin)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / ua if ua > 0 else 0.0

    keep: list[dict] = []
    for ty in sorted({p["type"] for p in proposals}):
        cls = sorted([p for p in proposals if p["type"] == ty],
                     key=lambda p: -p["score"])
        kept_cls: list[dict] = []
        for p in cls:
            if all(iou(p["bbox"], q["bbox"]) < iou_threshold
                   for q in kept_cls):
                kept_cls.append(p)
        keep.extend(kept_cls)
    return keep


def assign_chars_to_boxes(
    chars: list[dict],
    boxes: list[dict],
    mean_height: float,
) -> tuple[list[dict], list[dict]]:
    """J2 (pdf_parser.py:291-307): fold text-layer chars into detected
    line boxes — y-bisected best-overlap per char, height-mismatch chars
    (≥70% height delta, non-space) set aside as ``lefted_chars``, and a
    space char joins only after latin/numeric/punct text. Proposal-source
    agnostic: the reference's boxes come from the OCR detector, ours from
    any line proposal. Boxes are mutated (text appended); returns
    (boxes sorted as given, lefted_chars)."""
    lefted: list[dict] = []
    srt = sorted(chars, key=lambda c: (c["top"], c["x0"]))
    # the reference bubble-sorts with mean_height//4 threshold; plain
    # (top, x0) differs only on sub-threshold ties, which the overlap
    # assignment below resolves identically
    _ = mean_height
    for c in srt:
        ii = find_overlapped(c, boxes)
        if ii is None:
            lefted.append(c)
            continue
        ch = c["bottom"] - c["top"]
        bh = boxes[ii]["bottom"] - boxes[ii]["top"]
        if abs(ch - bh) / max(ch, bh, 1e-6) >= 0.7 and c["text"] != " ":
            lefted.append(c)
            continue
        if c["text"] == " " and boxes[ii]["text"]:
            import re as _re

            if _re.match(r"[0-9a-zA-Zа-яА-Я,.?;:!%%]", boxes[ii]["text"][-1]):
                boxes[ii]["text"] += " "
        else:
            boxes[ii]["text"] += c["text"]
    return boxes, lefted


def heuristic_layouts(
    page_boxes: list[dict],
    mean_height: float,
    page_height: float = 792.0,
) -> list[dict]:
    """Detector-free region proposals feeding ``assign_layouts`` — the
    deterministic slice of the layout model's classes this engine can
    infer from text-layer geometry alone:

    - "table": TSR-lite's aligned multi-cell line runs
    - "title": bullet/heading-pattern lines (updown.match_proj)
    - "header"/"footer": lines inside the 10% page bands
    - "text": bounding boxes of the remaining gap-separated blocks

    A real ONNX model's proposals drop into the same assign_layouts slot
    with scores; these carry none (layouts_cleanup then uses text-coverage
    tie-breaks, which is exactly its no-score path)."""
    from ragflow_spark.core import tsr_lite
    from ragflow_spark.core.updown import match_proj

    def bbox(ty, bxs):
        out = {
            "type": ty,
            "x0": min(b["x0"] for b in bxs), "x1": max(b["x1"] for b in bxs),
            "top": min(b["top"] for b in bxs),
            "bottom": max(b["bottom"] for b in bxs),
        }
        if "page_number" in bxs[0]:
            # ride along so synthesized figure boxes stay sortable/taggable
            out["page_number"] = bxs[0]["page_number"]
        return out

    proposals: list[dict] = []
    regions, rest = tsr_lite.detect_table_regions(list(page_boxes))
    for reg in regions:
        proposals.append(bbox("table", reg))
    flow: list[dict] = []
    for b in sorted(rest, key=lambda x: (x["top"], x["x0"])):
        if b["top"] < page_height * 0.1:
            proposals.append(bbox("header", [b]))
        elif b["bottom"] > page_height * 0.9:
            proposals.append(bbox("footer", [b]))
        elif match_proj(b["text"].strip()):
            proposals.append(bbox("title", [b]))
        else:
            flow.append(b)
    block: list[dict] = []
    for b in flow:
        if block and b["top"] - block[-1]["bottom"] > 1.5 * mean_height:
            proposals.append(bbox("text", block))
            block = []
        block.append(b)
    if block:
        proposals.append(bbox("text", block))
    return proposals


# the F3 garbage-text bank is shared with the heuristic layout path —
# one source of truth (pdf_layout._GARBAGE_PATTERNS)


def assign_layouts(
    pages_boxes: list[list[dict]],
    pages_layouts: list[list[dict]],
    page_height: float = 792.0,
    drop: bool = True,
) -> list[dict]:
    """J1 (layout_recognizer.py:68-151): per page, cleanup the layout
    regions then tag every text box with ``layoutno``/``layout_type`` by
    best-overlap assignment in the reference's fixed type order; boxes in
    garbage layouts drop unless the header/footer position exemption
    holds; text-less figure/equation regions synthesize empty boxes; text
    repeated across pages inside garbage layouts is swept at the end.
    Layout dicts: {type, x0, x1, top, bottom[, score]}.

    Parity note: synthesized figure boxes take ``figure-{enumerate index}``
    while real boxes take ``figure-{per-type assignment index}`` — the
    reference numbers them from the same two different lists
    (layout_recognizer.py:124,133), so a page can hold two regions sharing
    a layoutno; kept verbatim."""
    from ragflow_spark.core.pdf_layout import is_garbage_line

    out_boxes: list[dict] = []
    garbages: dict[str, list[str]] = {}
    for pn, (bxs, lts) in enumerate(zip(pages_boxes, pages_layouts)):
        bxs = [dict(b) for b in bxs]
        lts = [dict(lt) for lt in lts]
        if lts:
            # sort_Y_firstly with mean-height/2 threshold
            # (layout_recognizer.py:80-81): plain (top, x0) sort, then
            # bubble-restore x order for regions on the same visual line
            mean_h = sum(lt["bottom"] - lt["top"] for lt in lts) / len(lts)
            lts.sort(key=lambda r: (r["top"], r["x0"]))
            thr = mean_h / 2
            for i in range(len(lts) - 1):
                for j in range(i, -1, -1):
                    if abs(lts[j + 1]["top"] - lts[j]["top"]) < thr \
                            and lts[j + 1]["x0"] < lts[j]["x0"]:
                        lts[j], lts[j + 1] = lts[j + 1], lts[j]
            lts = layouts_cleanup(bxs, lts)

        def find_layout(ty):
            nonlocal bxs
            lts_ = [lt for lt in lts if lt["type"] == ty]
            i = 0
            while i < len(bxs):
                if bxs[i].get("layout_type"):
                    i += 1
                    continue
                if is_garbage_line(bxs[i]["text"]):
                    bxs.pop(i)
                    continue
                ii = find_overlapped_with_threshold(bxs[i], lts_, thr=0.4)
                if ii is None:
                    bxs[i]["layout_type"] = ""
                    i += 1
                    continue
                lts_[ii]["visited"] = True
                keep_feats = [
                    lts_[ii]["type"] == "footer"
                    and bxs[i]["bottom"] < page_height * 0.9,
                    lts_[ii]["type"] == "header"
                    and bxs[i]["top"] > page_height * 0.1,
                ]
                if drop and lts_[ii]["type"] in GARBAGE_LAYOUTS \
                        and not any(keep_feats):
                    garbages.setdefault(lts_[ii]["type"], []).append(
                        bxs[i]["text"])
                    bxs.pop(i)
                    continue
                bxs[i]["layoutno"] = f"{ty}-{ii}"
                bxs[i]["layout_type"] = (
                    lts_[ii]["type"] if lts_[ii]["type"] != "equation"
                    else "figure"
                )
                i += 1

        for lt_type in LAYOUT_ORDER:
            find_layout(lt_type)

        for i, lt in enumerate(
            [lt for lt in lts if lt["type"] in ("figure", "equation")]
        ):
            if lt.get("visited"):
                continue
            lt = deepcopy(lt)
            del lt["type"]
            lt["text"] = ""
            lt["layout_type"] = "figure"
            lt["layoutno"] = f"figure-{i}"
            bxs.append(lt)
        out_boxes.extend(bxs)

    garbage_set = set()
    for k, texts in garbages.items():
        for g, c in Counter(texts).items():
            if c > 1:
                garbage_set.add(g)
    return [b for b in out_boxes if b["text"].strip() not in garbage_set]
