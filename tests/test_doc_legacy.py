"""S12 legacy .doc: CFB container + FIB/piece-table text extraction,
round-tripped against the from-scratch writer, plus the naive-template
and Spark-pipeline integration."""

import random

import pytest

from ragflow_spark.core.doc_legacy import (
    DocError,
    build_simple_doc,
    extract_doc_text,
    parse_cfb,
)
from ragflow_spark.core.templates import run_template

PARAS = [
    "First paragraph of the legacy document body text.",
    "第二段包含中文内容与标点。",
    "Third paragraph closes the fixture.",
]


def test_roundtrip_utf16_piece():
    blob = build_simple_doc(PARAS)
    assert extract_doc_text(blob) == "\n".join(PARAS)


def test_roundtrip_compressed_cp1252_piece():
    paras = ["ASCII only paragraph one.", "Deuxième paragraphe café."]
    blob = build_simple_doc(paras, compressed=True)
    assert extract_doc_text(blob) == "\n".join(paras)


def test_parse_cfb_streams():
    streams = parse_cfb(build_simple_doc(PARAS))
    assert set(streams) == {"WordDocument", "0Table"}
    assert streams["WordDocument"][:2] == b"\xec\xa5"  # wIdent LE


def test_garbage_rejected():
    with pytest.raises(DocError):
        extract_doc_text(b"\x00" * 600)
    with pytest.raises(DocError):
        parse_cfb(b"PK\x03\x04 not ole")


def test_naive_template_doc_sections():
    blob = build_simple_doc(PARAS)
    chunks = run_template("naive", blob, "doc", lang="English")
    joined = "\n".join(c.chunk_text for c in chunks)
    for p in PARAS:
        assert p in joined


def test_doc_through_spark_pipeline(spark):
    from datetime import datetime

    from ragflow_spark.operators.extract import extract_chunks

    blob = build_simple_doc(PARAS)
    rows = [("https://fixture.test/doc/naive/0", datetime(2026, 1, 1),
             bytearray(blob), "", "en", "naive", "doc")]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, parser string, fmt string",
    )
    out = extract_chunks(pages, num_partitions=2).collect()
    assert all(r.error is None for r in out)
    assert any("legacy document body" in r.chunk_text for r in out)


# ------------------------------------------- multi-piece / mini-FAT fuzz

_CP1252_WORDS = ["plain ascii text", "café résumé", "naïve Zürich",
                 "quote » dash – bullet •", "100 µm ©2024"]
_UTF16_WORDS = ["中文段落内容", "mixed 中英 text", "emoji 🎉 non-bmp 𝄞",
                "русский текст", "plain too"]


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_multipiece_roundtrip(seed):
    """Fast-save-shaped piece tables: mixed CP1252/UTF-16 pieces with
    non-BMP chars (CPs count UTF-16 code units) must reassemble in CP
    order regardless of piece encoding."""
    rng = random.Random(seed * 47 + 29)
    pieces, expect = [], []
    for i in range(rng.randint(2, 6)):
        comp = rng.random() < 0.5
        words = _CP1252_WORDS if comp else _UTF16_WORDS
        txt = f"p{i} " + rng.choice(words)
        sep = "\r" if rng.random() < 0.7 else " "
        pieces.append((txt + sep, comp))
        expect.append(txt + ("\n" if sep == "\r" else " "))
    blob = build_simple_doc(pieces=pieces)
    assert extract_doc_text(blob) == "".join(expect)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_mini_table_roundtrip(seed):
    """Table stream routed through the CFB mini FAT (64-byte sectors in
    the root container) — the layout every real sub-4096-byte stream
    uses; combined with multi-piece tables."""
    rng = random.Random(seed * 53 + 31)
    pieces = []
    for i in range(rng.randint(1, 5)):
        comp = rng.random() < 0.5
        words = _CP1252_WORDS if comp else _UTF16_WORDS
        pieces.append((f"m{i} {rng.choice(words)}\r", comp))
    blob = build_simple_doc(pieces=pieces, mini_table=True)
    got = extract_doc_text(blob)
    want = "".join(t.replace("\r", "\n") for t, _ in pieces)
    assert got == want
