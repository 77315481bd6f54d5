"""Deterministic token counting.

The reference counts tokens with tiktoken's ``cl100k_base`` BPE
(``rag/utils/__init__.py:77-86``). tiktoken is not available in this
environment (and its vocabulary file is not public-domain-shippable inside
this repo), so the engine defines its own deterministic tokenizer with the
same *statistical* behavior — ~4 chars/token for Latin script, ~1 token per
CJK character, one token per punctuation mark — and uses it consistently on
both the golden-fixture side and the pipeline side, so the byte-identity
gate is exact end-to-end.

This is the one documented deviation from the reference: chunk *boundaries*
depend on token counts, and any engine not shipping the identical BPE vocab
will draw them slightly differently. Boundary semantics (strictly-greater
budget test, <8-token tag drop, 218-token hierarchical repack) are preserved
exactly; only the counting function differs.
"""

from __future__ import annotations

import re

# GPT-2/cl100k-style pretokenizer: contractions, letter runs, digit groups
# (cl100k groups digits in threes), single non-space symbols, space runs.
_PRETOK = re.compile(
    r"'(?:[sdmt]|ll|ve|re)"
    r"|[A-Za-zÀ-ɏ]+"
    r"|[0-9]{1,3}"
    r"|[^\sA-Za-z0-9À-ɏ⺀-鿿぀-ヿ가-힯]"
)

# CJK unified ideographs + kana + hangul: roughly one BPE token per char.
_CJK = re.compile(r"[⺀-鿿぀-ヿ가-힯]")


def _word_tokens(piece: str) -> int:
    """Sub-token count for one pretoken. Latin words average ~4 chars per
    BPE token; short words are single tokens."""
    n = len(piece)
    if n <= 4:
        return 1
    return (n + 3) // 4


def num_tokens_from_string(s: str) -> int:
    """Deterministic token count standing in for
    ``len(cl100k_base.encode(s))`` (rag/utils/__init__.py:82-86)."""
    if not s:
        return 0
    try:
        cjk = len(_CJK.findall(s))
        total = cjk
        for m in _PRETOK.finditer(s):
            piece = m.group(0)
            if piece[0].isalpha():
                total += _word_tokens(piece)
            else:
                total += 1
        return total
    except Exception:
        return 0


def truncate(s: str, max_len: int) -> str:
    """Token-budget truncation (rag/utils/__init__.py:89-91). Without a real
    BPE decode round-trip we truncate on pretoken boundaries."""
    if num_tokens_from_string(s) <= max_len:
        return s
    total = 0
    end = 0
    for m in _PRETOK.finditer(s):
        piece = m.group(0)
        total += _word_tokens(piece) if piece[0].isalpha() else 1
        if total > max_len:
            break
        end = m.end()
    return s[:end]
