"""Gate the Spark extraction pipeline against REFERENCE-EXECUTED goldens.

The fixture tests/goldens/ref_chunks_mixed256.json.gz is produced by
tools/gen_ref_goldens.py: the reference's own template dispatch
(rag/svr/task_executor.py FACTORY -> rag/app/*.chunk) executing over every
reference-executable doc of the SAME mixed-profile 256-doc corpus that the
`extract_pipeline_pages` headline query runs on. So the golden here is the
reference running, not our parity core — a mismatch means our pipeline
diverged from real RAGFlow output (modulo the documented shared stand-ins:
token counting, rag_tokenizer, markdown table renderer, Arc90 HTML
extractor).

Docs where the REFERENCE ITSELF crashes (charset-less text/plain email
attachments -> rag/app/email.py:63 .decode(None)) are recorded with
ref_error; our engine is deliberately lenient there (utf-8/ignore
fallback) and must still emit chunks without an error row.
"""

from __future__ import annotations

import gzip
import json
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "ref_chunks_mixed256.json.gz")


@pytest.fixture(scope="module")
def golden():
    with gzip.open(GOLDEN, "rt", encoding="utf-8") as f:
        return json.load(f)


def test_golden_covers_corpus(golden):
    # the executable subset must stay a substantial share of the corpus —
    # if make_doc's cycles change, regenerate via tools/gen_ref_goldens.py
    assert golden["n_docs_corpus"] == 256
    assert len(golden["docs"]) >= 240
    fmts = {v["fmt"] for v in golden["docs"].values()}
    assert fmts == {"txt", "json", "md", "eml", "html", "pdf",
                    "docx", "xlsx", "pptx"}
    parsers = {v["parser"] for v in golden["docs"].values()}
    assert {"naive", "book", "paper", "manual", "laws", "qa",
            "email", "presentation"} <= parsers


def test_pipeline_matches_reference_goldens(spark, golden):
    """Full Spark plan (generate_pages_df -> extract_chunks) must emit
    byte-identical chunk text sequences per url vs the executing
    reference."""
    from ragflow_spark.operators.extract import extract_chunks
    from ragflow_spark.sources.pages import generate_pages_df

    pages = generate_pages_df(spark, 256)
    chunks = extract_chunks(pages, num_partitions=8)
    rows = (
        chunks.select("url", "chunk_idx", "chunk_text", "error")
        .filter(chunks.url.isin(list(golden["docs"].keys())))
        .collect()
    )
    got: dict[str, list] = {}
    errs: dict[str, str] = {}
    for r in rows:
        if r.error is not None:
            errs[r.url] = r.error
        else:
            got.setdefault(r.url, []).append((r.chunk_idx, r.chunk_text))

    n_checked = 0
    for url, v in golden["docs"].items():
        assert url not in errs, (url, errs.get(url))
        ours = [t for _, t in sorted(got.get(url, []))]
        if v["ref_error"] is not None:
            # reference crashes on this doc; we are documented-lenient and
            # must still produce output
            assert ours, (url, "leniency contract: chunks expected")
            continue
        assert ours == v["chunks"], (
            url, v["fmt"], v["parser"],
            [a for a, b in zip(ours, v["chunks"]) if a != b][:1],
        )
        n_checked += 1
    assert n_checked >= 140


# ------------------------------------------- web-profile (bench corpus)

WEB_GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                          "ref_chunks_web4096.json.gz")


def test_bench_corpus_matches_reference_goldens(spark):
    """The html-dominant web-profile corpus — the SAME 4096-doc table
    bench.py and the scaling gate run on — gated against the executing
    reference — including giants, which run the reference once per
    production page window (12/22 pages per task). Corpus rev 2 adds a
    scanned-PDF slice (~2.5%): those docs are not reference-executable
    here (runtime-downloaded OCR weights), so they are gated against the
    encoded ground truths the rasters carry instead — every truth string
    must be recovered verbatim through the full distributed fallback."""
    from ragflow_spark.operators.extract import extract_chunks
    from ragflow_spark.sources.pages import (
        generate_pages_df,
        is_scanned_pdf,
        scanned_truths,
    )

    with gzip.open(WEB_GOLDEN, "rt", encoding="utf-8") as f:
        golden = json.load(f)
    assert golden["profile"] == "web"
    assert len(golden["docs"]) >= 3940
    assert golden["skipped_fmt_counts"].get("scanned_pdf", 0) >= 90
    assert all(v["ref_error"] is None for v in golden["docs"].values())

    pages = generate_pages_df(spark, 4096, profile="web")
    chunks = extract_chunks(pages, num_partitions=8,
                            template_cfg={"ocr_backend": "fake"})
    rows = chunks.select("url", "chunk_idx", "chunk_text", "error").collect()
    got: dict[str, list] = {}
    for r in rows:
        assert r.error is None, (r.url, r.error)
        got.setdefault(r.url, []).append((r.chunk_idx, r.chunk_text))
    n_checked = 0
    for url, v in golden["docs"].items():
        ours = [t for _, t in sorted(got.get(url, []))]
        assert ours == v["chunks"], (url, v["fmt"], v["parser"])
        n_checked += 1
    assert n_checked >= 3900

    n_scanned = 0
    for doc_id in range(4096):
        if not is_scanned_pdf(doc_id, "web"):
            continue
        url = next(u for u in got if u.endswith(f"/{doc_id}")
                   and "/pdf/" in u)
        joined = "\n".join(t for _, t in sorted(got[url]))
        for page in scanned_truths(doc_id):
            for truth in page:
                assert truth in joined, (url, truth)
        n_scanned += 1
    assert n_scanned >= 90
