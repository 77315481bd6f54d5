"""Generate reference-executed goldens for the pipeline corpus.

Runs the reference's own template dispatch (rag/svr/task_executor.py:66-83
FACTORY -> rag/app/*.chunk) over every reference-executable doc of the
mixed-profile pages corpus (ragflow_spark.sources.pages.make_doc) and
persists per-url chunk text lists as the golden fixture that
tests/test_ref_goldens.py gates the Spark `extract_chunks` pipeline
against.

Executable subset: txt (TxtParser / book / paper / qa / laws string
paths), json (RAGFlowJsonParser), md (RAGFlowMarkdownParser), eml
(stdlib email), html (via the Arc90 readability stand-in), and pdf
(the reference's real per-template Pdf.__call__ orchestration through
refstubs.template_pdf_instance's shared vision stand-in; docs beyond the
task page window skip). docx/xlsx/pptx need python-docx/openpyxl/
python-pptx - absent from this container - and stay gated by the
parity-core goldens (tests/test_pipeline.py).

Shared stand-ins on BOTH sides (the documented deviations): token counting
(tiktoken absent), rag_tokenizer (huqie dict absent), markdown table
rendering (markdown pkg absent; tests/refstubs routes the reference
through our render_table_html).

Usage: python tools/gen_ref_goldens.py [n_docs] [out.json] [profile]
"""

from __future__ import annotations

import json
import os
import random
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

EXEC_FMTS = ("txt", "json", "md", "eml", "html", "pdf", "docx", "xlsx", "pptx")

# (parser, fmt) pairs our engine supports as extensions but the reference
# refuses outright (rag/app/paper.py:142 "pdf supported") — no golden
NOT_IN_REFERENCE = {("paper", "txt"), ("paper", "html")}

# pdf docs run the reference's real Pdf.__call__ via the shared vision
# stand-in (refstubs.template_pdf_instance); docs beyond the parser's
# task page size run the reference ONCE PER PAGE WINDOW — the production
# task split (api/db/services/task_service.py:164-186) our
# run_template mirrors
PDF_PARSERS = ("naive", "book", "paper", "manual")


def _noop(*a, **k):
    pass


def ref_factory():
    import logging

    import refstubs

    refstubs.install_reference_stubs()
    import rag.app.book as book
    import rag.app.email as email_app
    import rag.app.laws as laws
    import rag.app.manual as manual
    import rag.app.naive as naive
    import rag.app.paper as paper
    import rag.app.qa as qa

    laws.logging = logging  # upstream laws.py misses the import (v0.13.0)
    # FACTORY dispatch per rag/svr/task_executor.py:66-83
    import rag.app.presentation as presentation

    return {
        "naive": naive.chunk,
        "book": book.chunk,
        "paper": paper.chunk,
        "manual": manual.chunk,
        "qa": qa.chunk,
        "laws": laws.chunk,
        "email": email_app.chunk,
        "presentation": presentation.chunk,
    }, {
        "naive": naive, "book": book, "paper": paper, "manual": manual,
        "qa": qa, "laws": laws,
    }


def generate(n_docs: int, profile: str = "mixed") -> dict:
    import refstubs

    from ragflow_spark.core import pdf_mini
    from ragflow_spark.sources.pages import make_doc

    factory, modules = ref_factory()
    golden: dict[str, dict] = {}
    skipped: dict[str, int] = {}
    from ragflow_spark.sources.pages import is_scanned_pdf

    for doc_id in range(n_docs):
        d = make_doc(doc_id, profile)
        fmt, parser = d["fmt"], d["parser"]
        if is_scanned_pdf(doc_id, profile):
            # corpus rev 2: image-only PDFs — the reference OCRs these via
            # runtime-downloaded weights it cannot fetch here; our side is
            # gated by the encoded ground truths instead (test_ref_goldens
            # recomputes scanned_truths per doc)
            skipped["scanned_pdf"] = skipped.get("scanned_pdf", 0) + 1
            continue
        if (fmt not in EXEC_FMTS or parser not in factory
                or (parser, fmt) in NOT_IN_REFERENCE
                or (fmt == "pdf" and parser not in PDF_PARSERS)):
            skipped[fmt] = skipped.get(fmt, 0) + 1
            continue

        # the reference's is_english() samples via random.choices
        # (rag/nlp/__init__.py random_choices) - pin the global RNG so the
        # golden is a pure function of doc_id
        random.seed(doc_id)
        fn = factory[parser]
        name = f"doc{doc_id}.{fmt}"
        mod = modules.get(parser)
        orig_pdf = getattr(mod, "Pdf", None)
        try:
            if fmt == "pdf":
                from ragflow_spark.core.templates import PDF_TASK_PAGES

                size = PDF_TASK_PAGES.get(parser, 12)
                npages = pdf_mini.page_count(d["html"])
                chunks = []
                for p in range(0, max(1, npages), size):
                    inst = refstubs.template_pdf_instance(
                        orig_pdf, d["html"], d["lang"])
                    mod.Pdf = lambda: inst
                    docs = fn(name, binary=d["html"], lang=d["lang"],
                              callback=_noop, from_page=p,
                              to_page=min(p + size, npages))
                    chunks.extend(
                        re.sub(r"@@[\t0-9.-]+?##", "",
                               c["content_with_weight"]) for c in docs)
            else:
                docs = fn(name, binary=d["html"], lang=d["lang"],
                          callback=_noop)
                # strip position tags (@@pn\tx0..##) so goldens compare
                # against tag-free chunk_text; span/tag parity is pinned
                # by tests/test_pipeline.py + the e2e pdf A/B separately
                chunks = [re.sub(r"@@[\t0-9.-]+?##", "",
                                 c["content_with_weight"]) for c in docs]
            err = None
        except Exception as exc:  # reference-side refusal (e.g. laws empty)
            chunks, err = [], f"{type(exc).__name__}: {exc}"
        finally:
            if fmt == "pdf" and orig_pdf is not None:
                mod.Pdf = orig_pdf
        golden[d["url"]] = {
            "doc_id": doc_id,
            "fmt": fmt,
            "parser": parser,
            "lang": d["lang"],
            "chunks": chunks,
            "ref_error": err,
        }
    return {
        "profile": profile,
        "n_docs_corpus": n_docs,
        "executable_fmts": list(EXEC_FMTS),
        "skipped_fmt_counts": skipped,
        "docs": golden,
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    profile = sys.argv[3] if len(sys.argv) > 3 else "mixed"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "tests", "goldens", f"ref_chunks_{profile}{n}.json.gz")
    data = generate(n, profile)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    payload = json.dumps(data, ensure_ascii=False, indent=0,
                         sort_keys=True).encode("utf-8")
    if out.endswith(".gz"):
        import gzip

        with open(out, "wb") as f:
            f.write(gzip.compress(payload, mtime=0))
    else:
        with open(out, "wb") as f:
            f.write(payload)
    n_ok = sum(1 for v in data["docs"].values() if v["ref_error"] is None)
    n_err = len(data["docs"]) - n_ok
    print(f"goldens: {len(data['docs'])} docs ({n_ok} ok, {n_err} ref-error) "
          f"of {n} corpus docs -> {out}")


if __name__ == "__main__":
    main()
