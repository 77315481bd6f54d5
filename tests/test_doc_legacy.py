"""S12 legacy .doc: CFB container + FIB/piece-table text extraction,
round-tripped against the from-scratch writer, plus the naive-template
and Spark-pipeline integration."""

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
