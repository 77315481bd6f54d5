"""Import /root/reference modules with their asset/binary deps stubbed,
for direct A/B parity tests (the reference's own code executing against
ours). Token counting and tokenization route through OUR deterministic
stand-ins on both sides — those are the documented deviations — so any
remaining difference is an implementation divergence."""

from __future__ import annotations

import sys
import types

_READY = False


class _AnyAttrModule(types.ModuleType):
    """Module stub that yields a benign constant for any attribute —
    enough for modules only touched inside methods we never call (cv2
    constants in default args, etc.)."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return 0


def install_reference_stubs() -> None:
    global _READY
    if _READY:
        return
    from ragflow_spark.core.tokens import num_tokens_from_string as our_nts
    from ragflow_spark.core.updown import default_tokenize

    class _Enc:
        def encode(self, s):
            return list(range(our_nts(s)))

        def decode(self, toks):
            return ""

    def _mod(name, **attrs):
        # never shadow a REAL installed module (openpyxl/pandas etc. must
        # stay genuine); update attrs on prior stubs, fabricate the rest
        existing = sys.modules.get(name)
        if existing is not None and getattr(existing, "__spec__", None) \
                is not None and not isinstance(existing, _AnyAttrModule):
            return existing  # real module
        if existing is None:
            try:
                __import__(name)
                return sys.modules[name]
            except Exception:
                pass
        m = existing or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    def _raise(exc):
        def f(s):
            raise exc(s)
        return f

    _mod("tiktoken", get_encoding=lambda name: _Enc())
    pil_img = _AnyAttrModule("PIL.Image")
    pil_img.Image = type("Image", (), {})
    sys.modules["PIL.Image"] = pil_img
    _mod("PIL", Image=pil_img)
    _mod("roman_numbers", number=_raise(ValueError))
    w2n_sub = _mod("word2number.w2n", word_to_num=_raise(ValueError))
    _mod("word2number", w2n=w2n_sub)
    _mod("cn2an", cn2an=_raise(ValueError))
    fu = _mod("api.utils.file_utils",
              get_project_base_directory=lambda: "/tmp",
              traversal_files=lambda p: [])
    au = _mod("api.utils", file_utils=fu)
    _mod("api.settings", LIGHTEN=1)
    svc = _mod("api.db.services.knowledgebase_service",
               KnowledgebaseService=object)
    dbs = _mod("api.db.services", knowledgebase_service=svc)
    dbm = _mod("api.db", services=dbs, ParserType=object)
    _mod("api", utils=au, settings=sys.modules["api.settings"], db=dbm)
    _mod("rag.nlp.rag_tokenizer",
         tokenize=lambda s: " ".join(default_tokenize(s)),
         fine_grained_tokenize=lambda s: s,
         is_chinese=lambda c: "一" <= c <= "鿿",
         tag=lambda t: "")
    sys.modules.setdefault("cv2", _AnyAttrModule("cv2"))
    _mod("onnxruntime")
    _mod("pdfplumber", open=_raise(RuntimeError))
    _mod("pypdf", PdfReader=object)

    class _DMatrix:
        def __init__(self, rows):
            self.rows = rows

    _mod("xgboost", DMatrix=_DMatrix, Booster=object)
    _mod("huggingface_hub", snapshot_download=lambda **kw: "/tmp")
    shp = _mod("shapely")
    shp_geom = _mod("shapely.geometry", Polygon=object)
    shp.geometry = shp_geom
    sys.modules.setdefault("pyclipper", _AnyAttrModule("pyclipper"))
    docx_img_exc = _mod("docx.image.exceptions",
                        UnrecognizedImageError=type("E1", (Exception,), {}),
                        UnexpectedEndOfFileError=type("E2", (Exception,), {}),
                        InvalidImageStreamError=type("E3", (Exception,), {}))
    docx_img = _mod("docx.image", exceptions=docx_img_exc)
    _mod("docx", Document=object, image=docx_img)
    _mod("openpyxl", load_workbook=object, Workbook=object)
    _mod("pptx", Presentation=object)
    # the real `markdown` pkg is absent; route the reference's table
    # rendering through OUR renderer (mimics the markdown-pkg table HTML
    # shape) — a shared stand-in like the tokenizer, so template A/Bs
    # compare everything EXCEPT the renderer itself
    from ragflow_spark.core.markdown import render_table_html

    _mod("markdown", markdown=lambda s, **kw: render_table_html(s))
    tika = _mod("tika")
    tika.parser = types.SimpleNamespace(
        from_buffer=lambda b: {"content": ""})
    _mod("tika.parser", from_buffer=tika.parser.from_buffer)
    sys.modules.setdefault("chardet", _AnyAttrModule("chardet"))

    # readability-lxml + html_text are absent: route the reference's
    # RAGFlowHtmlParser through OUR Arc90 extractor (core/html_extract),
    # the documented S2 stand-in — shared on both sides, so html-path
    # template A/Bs compare everything DOWNSTREAM of main-content
    # extraction (section split, merges, tokenize_chunks) for real
    from ragflow_spark.core import html_extract as _he

    class _RefDoc:
        def __init__(self, txt, **kw):
            self._title, self._content = _he.extract(txt)

        def title(self):
            return self._title

        def summary(self, html_partial=False):
            return self._content

    _mod("readability", Document=_RefDoc)
    _mod("html_text", extract_text=lambda s: s)

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    _READY = True


def load_ref_nlp():
    install_reference_stubs()
    import rag.nlp as ref_nlp

    return ref_nlp


def load_ref_pdf_parser():
    """The RAGFlowPdfParser CLASS without running its model-loading
    __init__ — callers set the per-doc attrs (boxes, mean_height, ...)
    and drive individual stages."""
    install_reference_stubs()
    from deepdoc.parser.pdf_parser import RAGFlowPdfParser

    return RAGFlowPdfParser


def load_ref_tsr():
    install_reference_stubs()
    from deepdoc.vision.table_structure_recognizer import (
        TableStructureRecognizer,
    )

    return TableStructureRecognizer


def load_ref_recognizer():
    install_reference_stubs()
    from deepdoc.vision.recognizer import Recognizer

    return Recognizer


def bare_pdf_parser(mean_height, mean_width, page_sizes=None,
                    page_cum_height=None, predict=None):
    """object.__new__ instance with the attrs the W/F stages read; the
    up-down booster slot takes any predict(fea)->score callable."""
    cls = load_ref_pdf_parser()
    obj = object.__new__(cls)
    obj.mean_height = list(mean_height)
    obj.mean_width = list(mean_width)
    obj.page_cum_height = list(page_cum_height or [0.0])
    obj.lefted_chars = []
    obj.boxes = []

    class _Img:
        def __init__(self, wh):
            self.size = wh

    obj.page_images = [_Img(wh) for wh in (page_sizes or [])]

    class _Mdl:
        def predict(self, dmatrix):
            return [predict(fea) for fea in dmatrix.rows]

    if predict is not None:
        obj.updown_cnt_mdl = _Mdl()
    return obj
