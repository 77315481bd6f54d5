"""CTC label decode (postprocess.py:258-368), charset-pluggable."""

import numpy as np

from ragflow_spark.core.ocr_decode import CTCLabelDecode


def _logits(seq, n_classes, T_pad=0):
    """One-hot-ish logits for an index sequence (+ optional trailing blanks)."""
    seq = list(seq) + [0] * T_pad
    out = np.full((1, len(seq), n_classes), 0.01, dtype=np.float32)
    for t, idx in enumerate(seq):
        out[0, t, idx] = 0.9
    return out


def test_ctc_collapse_and_blank_removal():
    # charset: blank + h e l o  (indices 1..4)
    dec = CTCLabelDecode(["h", "e", "l", "o"])
    # h h e 0 l l 0 l o -> "hello" (repeat collapse BEFORE blank removal,
    # so the 0-separated double-l survives)
    preds = _logits([1, 1, 2, 0, 3, 3, 0, 3, 4], 5)
    [(text, conf)] = dec(preds)
    assert text == "hello"
    assert 0.0 < conf <= 1.0


def test_ctc_all_blank_and_confidence_floor():
    dec = CTCLabelDecode(["a"])
    [(text, conf)] = dec(_logits([0, 0, 0], 2))
    assert text == "" and conf == 0.0


def test_space_char_and_reference_default_charset():
    dec = CTCLabelDecode(["a", "b"], use_space_char=True)
    preds = _logits([1, 0, 3, 0, 2], 4)  # a ' ' b
    [(text, _)] = dec(preds)
    assert text == "a b"
    # None charset → the reference's builtin 0-9a-z fallback
    d2 = CTCLabelDecode()
    assert d2.character[1] == "0" and d2.character[10] == "9"
    assert d2.character[11] == "a"


def test_pred_reverse_arabic_quirk():
    dec = CTCLabelDecode(["x"], reverse=True)
    # latin runs keep internal order while the sequence reverses
    assert dec.pred_reverse("abc7د12") == "12دabc7"
