"""W5 up-down concatenation + F6 scrap filter — the model-adjacent merge
tier of the reference PDF pipeline, rebuilt deterministic.

The reference decides "does box B continue box A's paragraph?" with a
32-feature vector (deepdoc/parser/pdf_parser.py:106-161) scored by a
non-vendored XGBoost booster (``updown_concat_xgb.model``,
pdf_parser.py:43-63), consumed by a chain-building DFS
(``_concat_downward``, pdf_parser.py:441-548). This module ports the
feature extractor and the merge walk faithfully and keeps the scorer
PLUGGABLE: the default ``booster_score`` is a deterministic GBDT trained
by tools/train_updown.py on a synthetic labeled layout corpus (held-out
accuracy in ``updown_model.META``), ``rule_score`` is the interpretable
hand-set fallback, and a real booster's ``predict(fea) -> float`` drops
into the same slot when the asset exists.

Documented deviations from the reference:
- tokenizer: features 25-27/30-31 use ``default_tokenize`` (latin words +
  per-CJK-char) instead of rag_tokenizer (its huqie dict is absent from the
  reference repo itself); POS-tag features 30/31 are False under the
  default ``tag_fn`` for the same reason.
- region identity: the reference's ``layoutno`` comes from the ONNX layout
  detector; ``assign_pseudo_regions`` reconstructs it geometrically
  (page break / >1.5x line-gap starts a new region), which is the honest
  deterministic salvage of the detector's role in the merge gates.

Also here:
- ``filter_forpages``  — box-level TOC page removal (pdf_parser.py:550-599)
  including the dotted-leader ``page_dirty`` fallback branch.
- ``proj_match_level`` — the leveled bullet matcher (pdf_parser.py:819-841).
- ``filterout_scraps`` — F6 (pdf_parser.py:859-930): groups reading-order
  boxes into visual chains and drops chains that are narrow, short and
  bullet-less (page decorations, stray crumbs), with the reference's
  bullet/width exemptions.
"""

from __future__ import annotations

import re
import statistics


def _y_dis(a: dict, b: dict) -> float:
    return (b["top"] + b["bottom"] - a["top"] - a["bottom"]) / 2


def _x_dis(a: dict, b: dict) -> float:
    return min(
        abs(a["x1"] - b["x0"]), abs(a["x0"] - b["x1"]),
        abs(a["x0"] + a["x1"] - b["x0"] - b["x1"]) / 2,
    )


def _height(b: dict) -> float:
    return b["bottom"] - b["top"]


def _char_width(b: dict) -> float:
    # reference uses floor-division (pdf_parser.py:78-79)
    return (b["x1"] - b["x0"]) // max(len(b["text"]), 1)


# --------------------------------------------------------- projection match

_PROJ_PATTERNS = [
    r"第[零一二三四五六七八九十百]+章",
    r"第[零一二三四五六七八九十百]+[条节]",
    r"[零一二三四五六七八九十百]+[、是 　]",
    r"[\(（][零一二三四五六七八九十百]+[）\)]",
    r"[\(（][0-9]+[）\)]",
    r"[0-9]+(、|\.[　 ]|）|\.[^0-9./a-zA-Z_%><-]{4,})",
    r"[0-9]+\.[0-9.]+(、|\.[ 　])",
    # reference-exact bullet class incl. the private-use glyphs and the
    # ASCII space (pdf_parser.py:104) — a leading-space line matches; the
    # pseudo-region classifier strips before calling for that reason
    r"[⚫•➢①② ]",
]


def match_proj(text: str) -> bool:
    """Feature-bank bullet/heading matcher (pdf_parser.py:93-105)."""
    return any(re.match(p, text) for p in _PROJ_PATTERNS)


def proj_match_level(line: str):
    """Leveled variant used by the scrap filter (pdf_parser.py:819-841):
    None = too short / no signal, False = numeric noise, int = bullet
    level."""
    if len(line) <= 2:
        return None
    if re.match(r"[0-9 ().,%%+/-]+$", line):
        return False
    for p, j in [
        (r"第[零一二三四五六七八九十百]+章", 1),
        (r"第[零一二三四五六七八九十百]+[条节]", 2),
        (r"[零一二三四五六七八九十百]+[、 　]", 3),
        (r"[\(（][零一二三四五六七八九十百]+[）\)]", 4),
        (r"[0-9]+(、|\.[　 ]|\.[^0-9])", 5),
        (r"[0-9]+\.[0-9]+(、|[. 　]|[^0-9])", 6),
        (r"[0-9]+\.[0-9]+\.[0-9]+(、|[ 　]|[^0-9])", 7),
        (r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+(、|[ 　]|[^0-9])", 8),
        (r".{,48}[：:?？]$", 9),
        (r"[0-9]+）", 10),
        (r"[\(（][0-9]+[）\)]", 11),
        (r"[零一二三四五六七八九十百]+是", 12),
        (r"[⚫•➢✓]", 12),
    ]:
        if re.match(p, line):
            return j
    return None


# ----------------------------------------------------------------- features

def default_tokenize(text: str) -> list[str]:
    """Feature tokenizer: latin word runs + one token per CJK char, lowered.
    Mirrors rag_tokenizer's granularity closely enough for the count/equality
    features; returns [''] for no tokens (the reference's ''.split(' ')
    shape)."""
    toks = re.findall(r"[a-z0-9]+|[一-鿿]", text.lower())
    return toks if toks else [""]


def _no_tag(_token: str) -> str:
    return ""


def updown_concat_features(
    up: dict, down: dict,
    tokenize=default_tokenize, tag_fn=_no_tag,
) -> list:
    """The 32-feature pair vector, index-for-index the reference's
    ``_updown_concat_features`` (pdf_parser.py:106-161). Boxes need
    text/x0/x1/top/bottom/page_number/in_row (+optional R, layout_type)."""
    w = max(_char_width(up), _char_width(down))
    h = max(_height(up), _height(down), 1e-6)
    y_dis = _y_dis(up, down)
    LEN = 6
    tks_down = tokenize(down["text"][:LEN])
    tks_up = tokenize(up["text"][-LEN:])
    tks_all = (
        up["text"][-LEN:].strip()
        + (" " if re.match(r"[a-zA-Z0-9]+", up["text"][-1] + down["text"][0])
           else "")
        + down["text"][:LEN].strip()
    )
    tks_all = tokenize(tks_all)
    ut, dt = up["text"], down["text"]
    fea = [
        up.get("R", -1) == down.get("R", -1),                            # 0
        y_dis / h,                                                       # 1
        down["page_number"] - up["page_number"],                         # 2
        up.get("layout_type", "") == down.get("layout_type", ""),        # 3
        up.get("layout_type", "") == "text",                             # 4
        down.get("layout_type", "") == "text",                           # 5
        up.get("layout_type", "") == "table",                            # 6
        down.get("layout_type", "") == "table",                          # 7
        bool(re.search(r"([。？！；!?;+)）]|[a-z]\.)$", ut)),             # 8
        bool(re.search(r"[，：‘“、0-9（+-]$", ut)),                       # 9
        bool(re.search(r"(^.?[/,?;:\]，。；：’”？！》】）-])", dt)),       # 10
        bool(re.match(r"[\(（][^\(\)（）]+[）\)]$", ut)),                 # 11
        bool(re.search(r"[，,][^。.]+$", ut)),                           # 12
        bool(re.search(r"[，,][^。.]+$", ut)),                           # 13 (kept duplicate, reference :135-136)
        bool(re.search(r"[\(（][^\)）]+$", ut)
             and re.search(r"[\)）]", dt)),                              # 14
        match_proj(down["text"]),                                        # 15
        bool(re.match(r"[A-Z]", dt)),                                    # 16
        bool(re.match(r"[A-Z]", ut[-1])),                                # 17
        bool(re.match(r"[a-z0-9]", ut[-1])),                             # 18
        bool(re.match(r"[0-9.%,-]+$", dt)),                              # 19
        ut.strip()[-2:] == dt.strip()[-2:]
        if len(ut.strip()) > 1 and len(dt.strip()) > 1 else False,       # 20
        up["x0"] > down["x1"],                                           # 21
        abs(_height(up) - _height(down))
        / max(min(_height(up), _height(down)), 1e-6),                    # 22
        _x_dis(up, down) / max(w, 0.000001),                             # 23
        (len(ut) - len(dt)) / max(len(ut), len(dt)),                     # 24
        len(tks_all) - len(tks_up) - len(tks_down),                      # 25
        len(tks_down) - len(tks_up),                                     # 26
        tks_down[-1] == tks_up[-1],                                      # 27
        max(down.get("in_row", 0), up.get("in_row", 0)),                 # 28
        abs(down.get("in_row", 0) - up.get("in_row", 0)),                # 29
        len(tks_down) == 1 and tag_fn(tks_down[0]).find("n") >= 0,       # 30
        len(tks_up) == 1 and tag_fn(tks_up[0]).find("n") >= 0,           # 31
    ]
    return fea


def booster_score(fea: list) -> float:
    """The trained occupant of the reference's booster slot
    (pdf_parser.py:43-63 loads ``updown_concat_xgb.model``; the weight
    file is non-vendored, so tools/train_updown.py trains a 40-tree
    depth-3 GBDT on a synthetic labeled layout corpus instead —
    held-out accuracy in ``updown_model.META``). Pure-python eval over
    the same 32-feature vector; >0.5 means 'down continues up'. This is
    the DEFAULT scorer; ``rule_score`` remains as the interpretable
    fallback and a real booster's ``predict(fea) -> float`` still drops
    into the same ``concat_downward`` slot."""
    from ragflow_spark.core.updown_model import LEARNING_RATE, TREES

    import math

    m = 0.0
    for tr in TREES:
        while isinstance(tr, tuple):
            f, t, left, right = tr
            tr = left if fea[f] <= t else right
        m += tr
    return 1.0 / (1.0 + math.exp(-LEARNING_RATE * m))


def rule_score(fea: list) -> float:
    """Hand-set linear vote over the same feature vector — the
    interpretable fallback scorer (>0.5 means 'down continues up');
    ``booster_score`` above is the trained default."""
    s = 0.5
    if fea[8]:
        s -= 0.45          # up ends a sentence
    if fea[15]:
        s -= 0.45          # down opens a new bullet/heading item
    if fea[9]:
        s += 0.35          # up ends with continuation punctuation
    if fea[10]:
        s += 0.35          # down starts with closing punctuation
    if fea[14]:
        s += 0.30          # a parenthesis opened in up closes in down
    if fea[18] and not fea[16]:
        s += 0.25          # latin text mid-sentence, down not capitalized
    if not fea[8] and not fea[15] and not fea[16]:
        s += 0.20          # unfinished sentence, down opens nothing new
    if fea[16] and fea[8]:
        s -= 0.10          # capitalized fresh sentence after a full stop
    if fea[19]:
        s -= 0.30          # down is numbers-only (page no / data crumb)
    if not fea[3]:
        s -= 0.20          # layout-type mismatch
    if fea[4] != fea[5]:
        s -= 0.50          # exactly one side is body text (title/table/
                           # figure never absorbs or joins a paragraph)
    if fea[6] or fea[7]:
        s -= 0.20          # tables never concat into text
    if fea[2] == 0:
        # vertical-distance penalty applies within a page only: across a
        # page break the cumulative-Y distance is dominated by the margins
        # (already bounded by the 16x-line-height geometric gate), so the
        # flat page-gap penalty below is the whole distance signal there
        s -= 0.15 * max(0.0, fea[1] - 1.5)
    s -= 0.05 * max(0, fea[2])           # page-gap penalty
    if fea[23] > 8:
        s -= 0.20          # horizontally detached
    if fea[21]:
        s -= 0.10          # up begins right of down's end (column artifact)
    return max(0.0, min(1.0, s))


# ----------------------------------------------------------- pseudo regions

def assign_pseudo_regions(boxes: list[dict], mean_height: list[float]) -> None:
    """Stand-in for the layout detector's ``layoutno``/``layout_type``:
    walk reading-order boxes and start a new region on a page change, a
    vertical gap over 1.5x the page's line height (paragraph break), or a
    bullet/heading line (``match_proj`` — the deterministic slice of the
    detector's "title" class). Title lines get ``layout_type="title"`` in
    their own region, so the W5 fast path never folds a heading into its
    body — the same separation the detector's title regions provide."""
    region = 0
    prev = None
    prev_title = False
    for b in boxes:
        # classify on the stripped text: the reference bullet class
        # contains an ASCII space, so an unstripped leading-space line
        # would hallucinate a title (and this classifier amplifies
        # match_proj far beyond its reference role as one booster feature)
        title = match_proj(b["text"].strip())
        if prev is not None:
            mh = mean_height[min(b["page_number"], len(mean_height)) - 1]
            if (
                b["page_number"] != prev["page_number"]
                or b["top"] - prev["bottom"] > 1.5 * mh
                or title
                or prev_title
            ):
                region += 1
        kind = "title" if title else "text"
        b["layoutno"] = f"{kind}-{region}"
        b["layout_type"] = kind
        prev = b
        prev_title = title


# --------------------------------------------------------- concat downward

def concat_downward(
    boxes: list[dict],
    mean_height: list[float],
    mean_width: list[float],
    predict=None,
    concat_between_pages: bool = True,
) -> list[dict]:
    """W5 (pdf_parser.py:441-548): chain boxes downward with geometric
    gates + scorer decisions, then concatenate each chain into one box.
    The reference's recursive DFS is tail-recursive; rewritten as a loop so
    thousand-line chains can't hit the Python recursion limit. Returns a
    new box list in final reading order."""
    if predict is None:
        predict = booster_score
    # in_row feature: neighbors within one line height (pdf_parser.py:443-456)
    for i, b in enumerate(boxes):
        mh = mean_height[b["page_number"] - 1]
        b["in_row"] = 0
        j = max(0, i - 12)
        while j < min(i + 12, len(boxes)):
            if j == i:
                j += 1
                continue
            ydis = _y_dis(b, boxes[j]) / max(mh, 1e-6)
            if abs(ydis) < 1:
                b["in_row"] += 1
            elif ydis > 0:
                break
            j += 1

    bxs = [dict(b) for b in boxes]
    blocks: list[list[dict]] = []
    while bxs:
        chunks = [bxs[0]]
        pops = [0]
        up, dp = bxs[0], 1
        while True:
            merged_i = None
            i = dp
            while i < min(dp + 12, len(bxs)):
                down = bxs[i]
                ydis = _y_dis(up, down)
                smpg = up["page_number"] == down["page_number"]
                mh = mean_height[up["page_number"] - 1]
                mw = mean_width[up["page_number"] - 1]
                if smpg and ydis > mh * 4:
                    break
                if not smpg and ydis > mh * 16:
                    break
                if not concat_between_pages and \
                        down["page_number"] > up["page_number"]:
                    break
                if up.get("layout_type") == "text" and \
                        down.get("layout_type") == "title":
                    # a heading ends the section — body text must not chain
                    # past it into the next section's paragraphs (the
                    # reference's detector+booster achieve this separation;
                    # the skip-and-continue scan would otherwise tunnel)
                    break
                # empty-text skip FIRST: the reference checks the R gate
                # (which indexes up["text"][-1]) before it and crashes on
                # an empty-text box carrying a differing R
                if not down["text"].strip() or not up["text"].strip():
                    i += 1
                    continue
                if up.get("R", "") != down.get("R", "") and \
                        up["text"][-1] != "，":
                    i += 1
                    continue
                if re.match(r"[0-9]{2,3}/[0-9]{3}$", up["text"]) \
                        or re.match(r"[0-9]{2,3}/[0-9]{3}$", down["text"]):
                    i += 1
                    continue
                if up["x1"] < down["x0"] - 10 * mw \
                        or up["x0"] > down["x1"] + 10 * mw:
                    i += 1
                    continue
                if i - dp < 5 and up.get("layout_type") == "text":
                    # pdf_parser.py:500-507: same detected region → merge
                    # unscored; near pairs whose layoutnos DIFFER (incl.
                    # the "1"/"2" missing-key defaults) are VETOED without
                    # scoring. r5 note: an earlier build let cross-region
                    # near pairs fall through to the scorer on the theory
                    # that pseudo-regions are geometric guesses — the fuzz
                    # A/B (seed 36, giant-token line in its own region)
                    # showed that diverges from the reference whenever the
                    # scorer would bridge what the region split separates,
                    # so the veto is the contract.
                    if up.get("layoutno", "1") == down.get("layoutno", "2"):
                        merged_i = i
                        break
                    i += 1
                    continue
                fea = updown_concat_features(up, down)
                if predict(fea) <= 0.5:
                    i += 1
                    continue
                merged_i = i
                break
            if merged_i is None:
                break
            chunks.append(bxs[merged_i])
            pops.append(merged_i)
            up, dp = bxs[merged_i], merged_i + 1
        for idx in sorted(pops, reverse=True):
            bxs.pop(idx)
        blocks.append(chunks)

    # concat within each block (pdf_parser.py:524-547)
    out: list[dict] = []
    for blk in blocks:
        if len(blk) == 1:
            out.append(blk[0])
            continue
        t = blk[0]
        for c in blk[1:]:
            t["text"] = t["text"].strip()
            c["text"] = c["text"].strip()
            if not c["text"]:
                continue
            if t["text"] and re.match(
                r"[0-9\.a-zA-Z]+$", t["text"][-1] + c["text"][-1]
            ):
                t["text"] += " "
            t["text"] += c["text"]
            t["x0"] = min(t["x0"], c["x0"])
            t["x1"] = max(t["x1"], c["x1"])
            t["page_number"] = min(t["page_number"], c["page_number"])
            t["bottom"] = c["bottom"]
            if not t.get("layout_type") and c.get("layout_type"):
                t["layout_type"] = c["layout_type"]
        out.append(t)
    return sorted(out, key=lambda b: (b["top"], b["x0"]))


def merge_with_same_bullet(boxes: list[dict]) -> list[dict]:
    """W6 (pdf_parser.py:601-623): consecutive boxes opening with the SAME
    non-letter, non-CJK character (a bullet glyph) join with a newline —
    the box-level bullet-list stitch the book template runs after its
    vertical merge. Blank boxes are dropped as the reference walks."""
    boxes = list(boxes)
    i = 0
    while i + 1 < len(boxes):
        b, b_ = boxes[i], boxes[i + 1]
        if not b["text"].strip():
            boxes.pop(i)
            continue
        if not b_["text"].strip():
            boxes.pop(i + 1)
            continue
        c0, c1 = b["text"].strip()[0], b_["text"].strip()[0]
        if c0 != c1 \
                or c0.lower() in set("qwertyuopasdfghjklzxcvbnm") \
                or "一" <= c0 <= "鿿" \
                or b["top"] > b_["bottom"]:
            i += 1
            continue
        b_["text"] = b["text"] + "\n" + b_["text"]
        b_["x0"] = min(b["x0"], b_["x0"])
        b_["x1"] = max(b["x1"], b_["x1"])
        b_["top"] = b["top"]
        boxes.pop(i)
    return boxes


# ------------------------------------------------------------ TOC removal

def filter_forpages(boxes: list[dict], n_pages: int) -> list[dict]:
    """Box-level TOC removal (pdf_parser.py:550-599): on a 'contents'
    heading, drop it plus every following box sharing the first entry's
    prefix; fallback: pages with >3 dotted-leader lines are dropped whole.
    Returns the filtered list (reference mutates in place)."""
    boxes = list(boxes)
    if not boxes:
        return boxes
    findit = False
    i = 0
    while i < len(boxes):
        if not re.match(
            r"(contents|目录|目次|table of contents|致谢|acknowledge)$",
            re.sub(r"( | |　)+", "", boxes[i]["text"].lower()),
        ):
            i += 1
            continue
        findit = True
        eng = re.match(r"[0-9a-zA-Z :'.-]{5,}", boxes[i]["text"].strip())
        boxes.pop(i)
        if i >= len(boxes):
            break
        prefix = boxes[i]["text"].strip()[:3] if not eng else " ".join(
            boxes[i]["text"].strip().split(" ")[:2])
        while not prefix:
            boxes.pop(i)
            if i >= len(boxes):
                break
            prefix = boxes[i]["text"].strip()[:3] if not eng else " ".join(
                boxes[i]["text"].strip().split(" ")[:2])
        # the reference pops unconditionally here (pdf_parser.py:575) and
        # would crash when the while-loop above drained the list — guard it
        if i >= len(boxes) or not prefix:
            break
        boxes.pop(i)
        if i >= len(boxes):
            break
        for j in range(i, min(i + 128, len(boxes))):
            # re.escape: the prefix is raw document text; the reference
            # passes it as a regex and crashes on unbalanced metachars
            if not re.match(re.escape(prefix), boxes[j]["text"]):
                continue
            for _k in range(i, j):
                boxes.pop(i)
            break
    if findit:
        return boxes

    page_dirty = [0] * n_pages
    for b in boxes:
        # reference-verbatim (pdf_parser.py:588): all three alternatives
        # are the same U+00B7 pair in the original source too — two dead
        # branches kept for parity, not a transcription loss
        if re.search(r"(··|··|··)", b["text"]):
            page_dirty[b["page_number"] - 1] += 1
    dirty = {i + 1 for i, t in enumerate(page_dirty) if t > 3}
    if not dirty:
        return boxes
    return [b for b in boxes if b["page_number"] not in dirty]


# ------------------------------------------------------------ scrap filter

def filterout_scraps(
    boxes: list[dict],
    page_width: float,
    mean_height: list[float],
) -> list[list[dict]]:
    """F6 (pdf_parser.py:859-930): group reading-order boxes into visual
    chains (bullet-led or horizontally aligned), then keep a chain only if
    it starts with a bullet/heading, or its mean width covers >=35% of the
    page, or exceeds 200pt — everything else is page-decoration scrap.

    ``usefull`` gates chain membership: a box counts if it carries a
    detector layout_type, is wider than a third of the page, or taller
    than the page's line height (the reference reads these widths off the
    page images; here the caller passes the MediaBox width). Returns the
    kept chains — the caller renders text + position tags."""

    def width(b):
        return b["x1"] - b["x0"]

    def usefull(b):
        if b.get("layout_type"):
            return True
        if width(b) > page_width / 3:
            return True
        if _height(b) > mean_height[b["page_number"] - 1]:
            return True
        return False

    boxes = [dict(b) for b in boxes]
    res: list[list[dict]] = []
    while boxes:
        lines: list[dict] = []
        widths: list[float] = []
        mh = mean_height[boxes[0]["page_number"] - 1]
        mj = proj_match_level(boxes[0]["text"]) or \
            boxes[0].get("layout_type", "") == "title"

        # iterative port of the reference's tail-recursive dfs; the
        # reference pops chained boxes only as the recursion unwinds, so
        # every scan sees the intact list — mirror that by collecting pop
        # indices and removing them after the chain completes
        pops: list[int] = []
        if usefull(boxes[0]):
            line, st = boxes[0], 0
            while True:
                lines.append(line)
                widths.append(width(line))
                mmj = proj_match_level(line["text"]) or \
                    line.get("layout_type", "") == "title"
                nxt = None
                for i in range(st + 1, min(st + 20, len(boxes))):
                    if (boxes[i]["page_number"] - line["page_number"]) > 0:
                        break
                    if not mmj and _y_dis(line, boxes[i]) >= 3 * mh \
                            and _height(line) < 1.5 * mh:
                        break
                    if not usefull(boxes[i]):
                        continue
                    if mmj or (_x_dis(boxes[i], line) < page_width / 10):
                        nxt = i
                        break
                if nxt is None:
                    break
                pops.append(nxt)
                line, st = boxes[nxt], nxt
        for idx in sorted(pops, reverse=True):
            boxes.pop(idx)
        boxes.pop(0)
        if not widths:
            continue
        mw = statistics.mean(widths)
        if mj or mw / page_width >= 0.35 or mw > 200:
            res.append(lines)
    return res
