"""Round-2 template additions: email (C6), manual (C6), PDF outlines (S4),
Q2B folding (X4)."""

from email.message import EmailMessage

from pyspark.sql import functions as F

from ragflow_spark.core import office, pdf_mini
from ragflow_spark.core.templates import run_template
from ragflow_spark.functions.text import q2b, str_q2b


# reference _strQ2B (rag_tokenizer.py:88-102), verbatim semantics
def _ref_q2b(ustring: str) -> str:
    out = ""
    for uchar in ustring:
        code = ord(uchar)
        if code == 0x3000:
            code = 0x0020
        else:
            code -= 0xFEE0
        out += uchar if code < 0x0020 or code > 0x7E else chr(code)
    return out


# ------------------------------------------------------------------ email

def _email_blob(with_attachment: bool = True) -> bytes:
    msg = EmailMessage()
    msg["From"] = "alice@example.test"
    msg["To"] = "bob@example.test"
    msg["Subject"] = "Quarterly metrics review"
    msg.set_content(
        "Hello Bob.\nThe quarterly numbers look stable overall.\n"
        "Let me know if you spot anything odd."
    )
    msg.add_alternative(
        "<html><body><p>Hello Bob.</p><p>The quarterly numbers look "
        "stable overall in the rendered view.</p></body></html>",
        subtype="html",
    )
    if with_attachment:
        msg.add_attachment(
            b"attached plain text body\nwith a second line",
            maintype="text", subtype="plain", filename="notes.txt",
        )
    return bytes(msg)


def test_email_headers_body_and_attachment_order():
    cks = run_template("email", _email_blob(), "eml")
    all_text = "\n".join(c.chunk_text for c in cks)
    assert "Subject: Quarterly metrics review" in all_text
    assert "quarterly numbers look stable" in all_text
    # html alternative parsed too
    assert "rendered view" in all_text
    # attachment chunks come last, recursed through the naive template
    assert "attached plain text" in cks[-1].chunk_text
    assert [c.chunk_idx for c in cks] == list(range(len(cks)))


def test_email_bad_attachment_skipped():
    msg = EmailMessage()
    msg["Subject"] = "s"
    msg.set_content("body text")
    msg.add_attachment(b"\x00\x01garbage", maintype="application",
                      subtype="octet-stream", filename="blob.bin")
    cks = run_template("email", bytes(msg), "eml")
    assert any("body text" in c.chunk_text for c in cks)


# ---------------------------------------------------------------- outlines

def _outlined_pdf():
    outlines = [
        ("Introduction", 0),
        ("Background material", 1),
        ("Methods", 0),
        ("Data collection", 1),
        ("Statistical analysis", 1),
        ("Results", 0),
    ]
    pages = [
        ["Introduction", "intro body text one", "intro body text two"],
        ["Background material", "background body text"],
        ["Methods", "methods body text"],
        ["Data collection", "collection body text"],
        ["Statistical analysis", "analysis body text"],
        ["Results", "results body text", "more results text"],
    ]
    return pdf_mini.build_simple_pdf(pages, outlines=outlines), outlines


def test_extract_outlines_roundtrip():
    blob, outlines = _outlined_pdf()
    assert pdf_mini.extract_outlines(blob) == outlines


def test_extract_outlines_absent_is_empty():
    blob = pdf_mini.build_simple_pdf([["no outline here"]])
    assert pdf_mini.extract_outlines(blob) == []


# ------------------------------------------------------------------ manual

def test_manual_pdf_outline_driven_sections():
    blob, _outlines = _outlined_pdf()
    cks = run_template("manual", blob, "pdf")
    assert cks, "manual produced no chunks"
    all_text = "\n".join(c.chunk_text for c in cks)
    assert "intro body text one" in all_text
    assert "results body text" in all_text
    # spans survive the packing (tags ride inline and are parsed out)
    assert any(c.spans for c in cks)


def test_manual_docx_question_stack():
    blob = office.build_simple_docx(
        [("Setup", "Heading 1"),
         ("Install the unit on a flat surface.", ""),
         ("Power", "Heading 2"),
         ("Connect the supplied cable.", ""),
         ("Maintenance", "Heading 1"),
         ("Wipe with a dry cloth.", "")],
        tables=[[["part", "qty"], ["screw", "4"]]],
    )
    cks = run_template("manual", blob, "docx")
    texts = [c.chunk_text for c in cks]
    # tables first (colspan HTML form)
    assert texts[0].startswith("<table>")
    # question path joins stack + answer (the leading blank line is the
    # reference's own f'{last_answer}\n{p_text}' accumulation from "")
    assert "Setup\n\nInstall the unit on a flat surface." in texts[1]
    assert "Setup\nPower\n\nConnect the supplied cable." in texts[2]
    # a new H1 pops the stack
    assert "Maintenance\n\nWipe with a dry cloth." in texts[3]


# --------------------------------------------------------------------- q2b

def test_q2b_matches_reference_scalar():
    samples = [
        "ＨＥＬＬＯ　ｗｏｒｌｄ！１２３",
        "mixed ＡＳＣＩＩ and 中文　text（ok）",
        "no fullwidth here",
        "：；？！＂＃＄％＆＇（）＊＋，－．／",
    ]
    for s in samples:
        assert str_q2b(s) == _ref_q2b(s)


def test_q2b_column_native(spark):
    rows = [(1, "ＨＥＬＬＯ　ｗｏｒｌｄ！"), (2, "中文（全角）１２３")]
    df = spark.createDataFrame(rows, "id int, s string")
    got = {r.id: r.out for r in df.select("id", q2b(F.col("s")).alias("out")).collect()}
    assert got[1] == "HELLO world!"
    assert got[2] == "中文(全角)123"


def test_manual_pdf_title_frequency_fallback():
    """Outline-less PDF (outlines cover <10% of sections) must exercise the
    A4 title-frequency path (rag/app/manual.py:207-209): bullet-leveled
    headings become section pivots and body lines pack under them."""
    body = " ".join(f"word{i}" for i in range(40))  # >32 tokens per section
    pages = [[
        "1. Installation guide",
        f"unpack the device {body}",
        "2. Configuration steps",
        f"open the settings {body}",
        "3. Maintenance schedule",
        f"clean the filter {body}",
    ]]
    blob = pdf_mini.build_simple_pdf(pages)
    assert pdf_mini.extract_outlines(blob) == []
    chunks = run_template("manual", blob, "pdf", lang="English")
    texts = [c.chunk_text for c in chunks]
    # numbered headings are the most frequent title level -> they pivot the
    # packing: one chunk per section, body under its own heading
    assert len(texts) == 3
    assert "Installation guide" in texts[0] and "unpack the device" in texts[0]
    assert "Configuration steps" in texts[1] and "open the settings" in texts[1]
    assert "Maintenance schedule" in texts[2] and "clean the filter" in texts[2]
