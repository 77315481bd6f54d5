"""V2's deterministic half: CTC label decoding for the OCR recognizer
(deepdoc/vision/postprocess.py:258-368).

The recognition MODEL is weight-blocked, but everything after its logits
is published, deterministic numpy: per-timestep argmax → repeat collapse →
blank removal → charset lookup → mean-confidence. The reference loads its
vendored ``ocr.res`` charset (6 622 glyphs); this port is
CHARSET-PLUGGABLE like the huqie tokenizer (core/tokenizer.py) — pass the
reference's charset lines when the asset is available, or any charset for
tests (copying the 6 622-line file into this repo would be an asset copy,
not a reimplementation, so it ships as an input instead).

Includes the arabic ``pred_reverse`` quirk (latin runs keep their internal
order while the line reverses) exactly as the reference applies it when
the charset path mentions 'arabic'.
"""

from __future__ import annotations

import re

import numpy as np

DEFAULT_CHARSET = list("0123456789abcdefghijklmnopqrstuvwxyz")


class CTCLabelDecode:
    """postprocess.py:343-368 + the BaseRecLabelDecode machinery it
    inherits; blank is index 0 (``add_special_char`` prepends it)."""

    def __init__(self, characters: list[str] | None = None,
                 use_space_char: bool = False, reverse: bool = False):
        chars = list(characters) if characters is not None else list(
            DEFAULT_CHARSET)
        if characters is not None and use_space_char:
            chars.append(" ")
        self.reverse = reverse
        self.character = ["blank"] + chars
        self.dict = {c: i for i, c in enumerate(self.character)}

    def get_ignored_tokens(self) -> list[int]:
        return [0]  # ctc blank

    def pred_reverse(self, pred: str) -> str:
        """postprocess.py:288-302: reverse the line for RTL scripts while
        latin/numeric runs keep their internal order."""
        pred_re = []
        c_current = ""
        for c in pred:
            if not re.search("[a-zA-Z0-9 :*./%+-]", c):
                if c_current != "":
                    pred_re.append(c_current)
                pred_re.append(c)
                c_current = ""
            else:
                c_current += c
        if c_current != "":
            pred_re.append(c_current)
        return "".join(pred_re[::-1])

    def decode(self, text_index, text_prob=None,
               is_remove_duplicate: bool = False) -> list[tuple[str, float]]:
        """postprocess.py:307-338: indices → (text, mean confidence)."""
        result = []
        ignored = self.get_ignored_tokens()
        for b in range(len(text_index)):
            idx = np.asarray(text_index[b])
            selection = np.ones(len(idx), dtype=bool)
            if is_remove_duplicate:
                selection[1:] = idx[1:] != idx[:-1]
            for tok in ignored:
                selection &= idx != tok
            chars = [self.character[t] for t in idx[selection]]
            if text_prob is not None:
                conf = np.asarray(text_prob[b])[selection]
            else:
                conf = [1] * len(selection)
            if len(conf) == 0:
                conf = [0]
            text = "".join(chars)
            if self.reverse:
                text = self.pred_reverse(text)
            result.append((text, float(np.mean(conf))))
        return result

    def __call__(self, preds) -> list[tuple[str, float]]:
        """Logits [batch, T, n_chars+1] → decoded (text, confidence)."""
        if isinstance(preds, (tuple, list)):
            preds = preds[-1]
        preds = np.asarray(preds)
        preds_idx = preds.argmax(axis=2)
        preds_prob = preds.max(axis=2)
        return self.decode(preds_idx, preds_prob, is_remove_duplicate=True)
