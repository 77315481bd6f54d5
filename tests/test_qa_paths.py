"""QA template pdf/md/docx paths (rag/app/qa.py:72-408) + the embedded
index converters replacing w2n/cn2an/roman."""

import pytest

from ragflow_spark.core import pdf_mini, qa
from ragflow_spark.core.office import build_simple_docx
from ragflow_spark.core.templates import run_template


# ------------------------------------------------------------ index_int

def test_index_int_converters():
    assert qa.index_int("7") == 7
    assert qa.index_int("THREE") == 3
    assert qa.index_int("one") == 1
    assert qa.index_int("三") == 3
    assert qa.index_int("十") == 10
    assert qa.index_int("十三") == 13
    assert qa.index_int("二十") == 20
    assert qa.index_int("一百零五") == 105
    assert qa.index_int("IV") == 4
    assert qa.index_int("IX") == 9
    assert qa.index_int("X") == 10
    assert qa.index_int("junk") == -1
    assert qa.index_int("") == -1


# ------------------------------------------------------------- markdown

MD_DOC = """# Product FAQ
intro text that belongs to the faq root

## Install
### How do I install it?
Run the installer.

Then reboot.

### What are the requirements?
| os | version |
| -- | ------- |
| linux | any |

## Uninstall
### How do I remove it?
```
# this fenced hash is not a question
rm -rf /opt/app
```
Done.
"""


def test_qa_markdown_question_stack():
    pairs = qa.qa_pairs_from_markdown(MD_DOC)
    questions = [q for q, _ in pairs]
    # the answer under '# Product FAQ' flushes when '## Install' arrives
    assert questions[0] == "Product FAQ"
    # nested path: h1 stays on the stack under deeper questions
    assert questions[1] == "Product FAQ\nInstall\nHow do I install it?"
    assert "Run the installer." in pairs[1][1]
    assert "<p>" in pairs[1][1]
    # table answers render as HTML
    assert "<table>" in pairs[2][1] and "linux" in pairs[2][1]
    # the fenced '# this fenced hash' must NOT open a question
    assert all("fenced hash" not in q for q in questions)
    assert "rm -rf /opt/app" in pairs[3][1]


def test_qa_markdown_template_end_to_end():
    chunks = run_template("qa", MD_DOC.encode(), "md", lang="English")
    assert chunks
    assert all(c.chunk_text.startswith("Question: ") for c in chunks)
    assert any("\tAnswer: " in c.chunk_text for c in chunks)


# ----------------------------------------------------------------- docx

def test_qa_docx_heading_stack():
    blob = build_simple_docx([
        ("Warranty", "Heading 1"),
        ("How long is coverage?", "Heading 2"),
        ("Two years from purchase.", ""),
        ("What voids it?", "Heading 2"),
        ("Water damage voids coverage.", ""),
        ("Returns", "Heading 1"),
        ("How do I return?", "Heading 2"),
        ("Use the portal.", ""),
    ], [])
    pairs, tables = qa.qa_pairs_from_docx(blob)
    assert [q for q, _ in pairs] == [
        "Warranty\nHow long is coverage?",
        "Warranty\nWhat voids it?",
        "Returns\nHow do I return?",
    ]
    assert "Two years" in pairs[0][1]
    chunks = run_template("qa", blob, "docx", lang="English")
    assert len(chunks) == 3
    assert chunks[0].chunk_text.startswith("Question: Warranty")


# ------------------------------------------------------------------ pdf

def _qa_pdf():
    # explicit placement: >=20pt vertical gap before each question so the
    # has_qbullet indent/top gates admit them (the reference's geometry)
    lines = [
        (72, 750, "1. What is the product warranty?"),
        (72, 720, "The warranty covers two years of normal use."),
        (72, 690, "2. How do I reset the device?"),
        (72, 660, "Hold the power button for ten seconds."),
        (72, 630, "3. Where can I buy spare parts?"),
        (72, 600, "Spare parts are available from the online store."),
    ]
    return pdf_mini.build_positioned_pdf([lines])


def test_qa_pdf_bullet_walk():
    chunks = run_template("qa", _qa_pdf(), "pdf", lang="English")
    texts = [c.chunk_text for c in chunks]
    # reference quirk kept: the FIRST bullet can't prove its indent against
    # the synthetic empty last_box, so Q1 is skipped — Q2/Q3 are extracted
    assert len(texts) == 2
    assert texts[0].startswith("Question: 2. How do I reset the device?")
    assert "Answer: Hold the power button" in texts[0]
    assert texts[1].startswith("Question: 3. Where can I buy spare parts?")
    assert "online store" in texts[1]


def test_qa_pdf_unrecognizable_raises():
    blob = pdf_mini.build_simple_pdf([[
        "plain prose with no numbering at all",
        "more prose follows here",
    ]])
    with pytest.raises(ValueError, match="Q&A structure"):
        run_template("qa", blob, "pdf", lang="English")


def test_has_qbullet_colon_and_indent_gates():
    reg = r"([0-9]{1,2})[\. 、]"
    last = {"text": "The options are:", "x0": 72.0, "top": 100.0}
    box = {"text": "1. option one", "x0": 72.0, "top": 130.0,
           "layout_type": ""}
    # previous line ends with ':' → the number is a list item, not a question
    bull, _ = qa.has_qbullet(reg, box, last, None, None, [])
    assert bull is None
    # indented relative to the running bullet margin → continuation
    bull, _ = qa.has_qbullet(
        reg, {**box, "x0": 95.0},
        {"text": "2. earlier q?", "x0": 72.0, "top": 100.0}, 2, True, [72.0],
    )
    assert bull is None


def test_qa_pdf_malformed_tag_terminates():
    """Sections with empty/malformed position tags must not hang the
    table-fold walk (sentinel guard)."""
    sections = [
        ("intro text", "@@1\t10\t200\t10\t20##"),
        ("1. What is Spark?", ""),                     # malformed tag
        ("It is an engine.", "@@1\t10\t200\t80\t90##"),
    ]
    pairs = qa.qa_pairs_from_pdf(sections, tables=[])
    assert isinstance(pairs, list)  # completion IS the assertion


def test_qa_pdf_table_folds_on_page_two():
    """Regression: last_bottom must be PAGE-LOCAL (qa.py:154 re-parses it
    from the tag) so a same-page table after an answer line on page >= 2
    still satisfies `tbl_top >= last_bottom` and folds into the answer."""
    sections = [
        ("intro text before questions", "@@2\t72\t200\t60\t70##"),
        ("1. What is Spark?", "@@2\t72\t200\t100\t110##"),
        ("It is an engine.", "@@2\t72\t200\t130\t140##"),
        ("2. What is Arrow?", "@@2\t72\t200\t200\t210##"),
        ("A columnar format.", "@@2\t72\t200\t230\t240##"),
    ]
    tables = [("<table><tr><td>cell</td></tr></table>",
               "@@2\t72\t200\t150\t160##")]
    pairs = qa.qa_pairs_from_pdf(sections, tables)
    assert pairs[0] == ("1. What is Spark?",
                        "It is an engine.<table><tr><td>cell</td></tr></table>")
    assert pairs[1] == ("2. What is Arrow?", "A columnar format.")


def test_qa_pdf_real_page_heights_offset():
    """A4 pages (842pt) must use real cumulative heights for the doc-
    absolute has_qbullet frame, not a pinned 792/page."""
    sections = [("1. q?", "@@2\t72\t200\t10\t20##")]
    # smoke the cum-offset plumbing: same result as default on page 1,
    # and page_heights are honored without error
    pairs_default = qa.qa_pairs_from_pdf(list(sections), [])
    pairs_a4 = qa.qa_pairs_from_pdf(list(sections), [],
                                    page_heights=[842.0, 842.0])
    assert pairs_default == pairs_a4  # single box: offset can't change pairing


def test_pdf_mini_page_heights():
    blob = pdf_mini.build_simple_pdf([["page one line"], ["page two line"]])
    hs = pdf_mini.page_heights(blob)
    assert hs == [792.0, 792.0]
    assert len(hs) == len(pdf_mini.extract_boxes(blob))
