"""Window-BOUNDARY adversarial A/B (VERDICT r4 #7): the production task
windowing (12/22 pages per task, api/db/services/task_service.py:164-186)
makes each page window an independent reference ``chunk()`` run — so a
section, bullet chain, or table that STRADDLES the boundary is split, and
that split artifact is part of the contract. These cases plant exactly
such straddles on the boundary pages and pin that our windowed
``run_template`` equals the reference chunk()ed once per window,
byte-identical — including the artifacts.

Three straddle shapes per windowed template (naive, book, paper, manual,
laws, presentation) plus qa's own three:
  * section  — a heading is the LAST line of the final page of window 1,
               its body continues on the first page of window 2 (W4/W5
               concat may not cross the task boundary);
  * bullets  — a numbered bullet chain crosses the boundary (W6 same-
               bullet merge / hierarchical-merge levels are per-task);
  * table    — a 4-column grid ends at the bottom of the boundary page
               and continues at the top of the next (J5 cross-page table
               merge fires within a task, never across tasks).
"""

from __future__ import annotations

import logging
import random
import re
import sys

import pytest

sys.path.insert(0, "tests")
import refstubs  # noqa: E402

from ragflow_spark.core import pdf_mini  # noqa: E402
from ragflow_spark.core.templates import PDF_TASK_PAGES, run_template  # noqa: E402


def _noop(*a, **k):
    pass


def _remove_tag(t):
    return re.sub(r"@@[\t0-9.-]+?##", "", t)


@pytest.fixture(scope="module")
def ref_apps():
    refstubs.install_reference_stubs()
    import rag.app.book as book
    import rag.app.laws as laws
    import rag.app.manual as manual
    import rag.app.naive as naive
    import rag.app.paper as paper
    import rag.app.presentation as presentation
    import rag.app.qa as qa

    laws.logging = logging  # upstream v0.13.0 missing-import bug

    # upstream v0.13.0 bug: qa.Pdf.get_tbls_info (rag/app/qa.py:171)
    # returns 6 values (trailing comma drops the computed tbl_text) while
    # the caller at qa.py:122 unpacks 7 — ANY qa PDF with a detected
    # table crashes the reference task. Restore the evident intent (same
    # body, tbl_text returned) so the reference can execute, mirroring
    # the laws.logging repair above.
    def _get_tbls_info(self, tbls, tbl_index):
        if tbl_index >= len(tbls):
            return 1, 0, 0, 0, 0, "@@0\t0\t0\t0\t0##", ""
        pos = tbls[tbl_index][1][0]
        tbl_pn = pos[0] + 1
        tbl_left, tbl_right, tbl_top, tbl_bottom = pos[1:5]
        tbl_tag = "@@{}\t{:.1f}\t{:.1f}\t{:.1f}\t{:.1f}##".format(
            tbl_pn, tbl_left, tbl_right, tbl_top, tbl_bottom)
        tbl_text = "".join(tbls[tbl_index][0][1])
        return (tbl_pn, tbl_left, tbl_right, tbl_top, tbl_bottom, tbl_tag,
                tbl_text)

    qa.Pdf.get_tbls_info = _get_tbls_info

    # shared stand-in for the sampling vote: the reference's
    # random_choices (rag/nlp/__init__.py:185-187) draws WITH replacement
    # (random.choices), so a window holding a single bullet line can
    # randomly miss it and flip bullets_category to -1 — a seed artifact,
    # not an orchestration property. Our engine votes the FULL list
    # deterministically (the documented A2/A3 deviation), so this harness
    # routes both sides through the full-list vote — same pattern as the
    # vision/booster stand-ins: what's pinned here is the WINDOW-BOUNDARY
    # orchestration, with the sampling deviation controlled out.
    import rag.nlp as ragnlp

    def _full_list(arr, k):
        return arr

    ragnlp.random_choices = _full_list
    mods = {
        "naive": naive, "book": book, "paper": paper, "manual": manual,
        "laws": laws, "presentation": presentation, "qa": qa,
    }
    for m in mods.values():
        if hasattr(m, "random_choices"):
            m.random_choices = _full_list
    return mods


def _windowed_ab(mod, parser, blob, seed):
    """Reference chunk() once per page window, concatenated, vs our
    windowed run_template on the full blob."""
    size = PDF_TASK_PAGES.get(parser, 12)
    npages = pdf_mini.page_count(blob)
    assert npages > size, "fixture must actually span two windows"
    ref = []
    for p in range(0, npages, size):
        inst = refstubs.template_pdf_instance(mod.Pdf, blob, "English")
        orig = mod.Pdf
        try:
            mod.Pdf = lambda: inst
            random.seed(seed * 100 + p)
            docs = mod.chunk(f"s{seed}.pdf", binary=blob, lang="English",
                             callback=_noop, from_page=p,
                             to_page=min(p + size, npages))
            ref.extend(_remove_tag(c["content_with_weight"]) for c in docs)
        finally:
            mod.Pdf = orig
    random.seed(seed)
    ours = [c.chunk_text for c in run_template(parser, blob, "pdf",
                                               "English")]
    assert ref == ours, (parser, seed, len(ref), len(ours))
    return len(ref)


# ------------------------------------------------------------- fixtures

_WORDS = ("data spark query engine shuffle partition filter merge "
          "chunk token document extract").split()


def _body(r, n):
    out = []
    for _ in range(n):
        k = r.randint(6, 14)
        out.append(" ".join(r.choice(_WORDS) for _ in range(k))
                   .capitalize() + r.choice([".", "!", "?"]))
    return out


def _pos(lines, y0=770, dy=13, x=72):
    return [(x, y0 - dy * i, ln) for i, ln in enumerate(lines)]


def _plain_page(r, pn, nlines=14):
    return _pos([f"Chapter {pn + 1}" if pn % 4 == 0
                 else f"Section {pn + 1}.1"] + _body(r, nlines))


def _mk_section_straddle(size, seed):
    """Heading is the LAST line of page `size` (1-indexed); its body is
    the whole of page size+1 with no heading of its own."""
    r = random.Random(seed)
    pages = [_plain_page(r, pn) for pn in range(size - 1)]
    pages.append(_pos(_body(r, 12) + [f"Chapter {size}"]))   # boundary pg
    pages.append(_pos(_body(r, 14)))                         # continuation
    pages.append(_plain_page(r, size + 1))
    return pdf_mini.build_positioned_pdf(pages)


def _mk_bullet_straddle(size, seed, style="num"):
    """A bullet chain crosses the boundary: items 1-4 end page `size`,
    items 5-9 open page size+1. laws-style uses Article bullets (its
    hierarchical-merge levels), others a numbered chain (W6 class)."""
    r = random.Random(seed)

    def item(i):
        tail = " ".join(r.choice(_WORDS) for _ in range(8))
        if style == "laws":
            return f"Article {i}. This article regulates {tail}."
        return f"{i}. Provision {tail}."

    pages = [_plain_page(r, pn) for pn in range(size - 1)]
    pages.append(_pos([f"Chapter {size}"] + _body(r, 8)
                      + [item(i) for i in range(1, 5)]))
    pages.append(_pos([item(i) for i in range(5, 10)] + _body(r, 6)))
    pages.append(_plain_page(r, size + 1))
    return pdf_mini.build_positioned_pdf(pages)


_X_COLS = (72, 200, 330, 460)


def _grid(rows, y0, dy=15):
    out = []
    for rn, row in enumerate(rows):
        for cn, cell in enumerate(row):
            out.append((_X_COLS[cn], y0 - dy * rn, cell))
    return out


def _mk_table_straddle(size, seed):
    """4-col grid: header + 3 rows at the BOTTOM of page `size`, 4 more
    rows at the TOP of page size+1 — J5 merges them only when both halves
    are in one task; the boundary splits them into two tables."""
    r = random.Random(seed)
    head = ["stage", "rows", "bytes", "msec"]
    data = [[f"stage-{i}", str(r.randint(1, 9) * 100),
             str(r.randint(1, 9) * 4096), str(r.randint(10, 99))]
            for i in range(7)]
    pages = [_plain_page(r, pn) for pn in range(size - 1)]
    pages.append(
        _pos([f"Chapter {size}"] + _body(r, 6))
        + [(72, 180, f"Table {seed + 1}: stage metrics")]
        + _grid([head] + data[:3], y0=150)
    )
    pages.append(_grid(data[3:], y0=770) + _pos(_body(r, 8), y0=640))
    pages.append(_plain_page(r, size + 1))
    return pdf_mini.build_positioned_pdf(pages)


_TEMPLATES = ["naive", "book", "paper", "manual", "laws", "presentation"]


@pytest.mark.parametrize("parser", _TEMPLATES)
def test_section_straddles_window(ref_apps, parser):
    size = PDF_TASK_PAGES.get(parser, 12)
    n = _windowed_ab(ref_apps[parser], parser,
                     _mk_section_straddle(size, 3), 3)
    assert n > 0


@pytest.mark.parametrize("parser", _TEMPLATES)
def test_bullet_chain_straddles_window(ref_apps, parser):
    size = PDF_TASK_PAGES.get(parser, 12)
    style = "laws" if parser == "laws" else "num"
    n = _windowed_ab(ref_apps[parser], parser,
                     _mk_bullet_straddle(size, 5, style), 5)
    assert n > 0


@pytest.mark.parametrize("parser", _TEMPLATES)
def test_table_straddles_window(ref_apps, parser):
    size = PDF_TASK_PAGES.get(parser, 12)
    n = _windowed_ab(ref_apps[parser], parser,
                     _mk_table_straddle(size, 7), 7)
    assert n > 0


# ------------------------------------------------------------------- qa

def _mk_qa_straddle(seed, kind):
    """qa straddles: the question line is the last line of page 12 and
    its answer opens page 13 ('question'); an answer body crosses the
    boundary ('answer'); a table belonging to a page-12 answer sits on
    page 13 ('table')."""
    r = random.Random(seed)

    def qa_lines(q, n_ans):
        out = [f"QUESTION {q}",
               f"What is the meaning of term {q} in the glossary?"]
        out += [f"The answer explains term {q} in detail with more "
                f"words here part {i}." for i in range(n_ans)]
        return out

    pages = []
    for pn in range(11):
        lines = []
        q0 = pn * 3 + 1
        for q in range(q0, q0 + 3):
            lines += qa_lines(q, r.randint(1, 2))
        pages.append(_pos(lines))
    if kind == "question":
        pages.append(_pos(qa_lines(90, 1) + ["QUESTION 91",
                     "What is the meaning of term 91 in the glossary?"]))
        pages.append(_pos(["The answer explains term 91 in detail with "
                           "more words here."] + qa_lines(92, 2)))
    elif kind == "answer":
        pages.append(_pos(qa_lines(90, 6)))
        pages.append(_pos(["The answer continues across the task "
                           "boundary with more detail here."]
                          + qa_lines(92, 2)))
    else:  # table
        head = ["term", "value", "unit", "note"]
        data = [[f"t{i}", str(100 + i), "ms", "ok"] for i in range(3)]
        pages.append(_pos(qa_lines(90, 2)))
        pages.append(_grid([head] + data, y0=770)
                     + _pos(qa_lines(92, 2), y0=660))
    pages.append(_pos(qa_lines(95, 2)))
    return pdf_mini.build_positioned_pdf(pages)


@pytest.mark.parametrize("kind", ["question", "answer", "table"])
def test_qa_straddles_window(ref_apps, kind):
    """qa is the page-window oddball: task_service splits qa PDFs into
    12-page tasks like any pdf, but rag/app/qa.py:294 takes NO
    from_page/to_page (they land in **kwargs) and qa.py:355-357 hardcodes
    to_page=10000 — so every task re-chunks the WHOLE document and the
    identical copies collapse downstream under the content-md5 chunk id.
    The pin: each reference task window emits the same whole-doc set, and
    our run emits exactly one copy of it."""
    mod = ref_apps["qa"]
    blob = _mk_qa_straddle(11, kind)
    npages = pdf_mini.page_count(blob)
    assert npages > 12
    windows = []
    for p in range(0, npages, 12):
        inst = refstubs.template_pdf_instance(mod.Pdf, blob, "English")
        orig = mod.Pdf
        try:
            mod.Pdf = lambda: inst
            random.seed(1100 + p)
            docs = mod.chunk(f"s11.pdf", binary=blob, lang="English",
                             callback=_noop, from_page=p,
                             to_page=min(p + 12, npages))
            windows.append([_remove_tag(c["content_with_weight"])
                            for c in docs])
        finally:
            mod.Pdf = orig
    # every task produced the identical whole-doc set (the page range is
    # ignored) — the md5 chunk-id dedup therefore keeps exactly one copy
    assert all(w == windows[0] for w in windows[1:])
    random.seed(11)
    ours = [c.chunk_text for c in run_template("qa", blob, "pdf",
                                               "English")]
    assert windows[0] == ours, (kind, len(windows[0]), len(ours))
    assert len(ours) > 0
