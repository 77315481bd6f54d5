"""Regex pattern banks and small text classifiers.

Models rag/nlp/__init__.py: ``BULLET_PATTERN`` (:157-182), ``not_bullet``
(:192-196), ``not_title`` (:380-387), ``is_english`` (:216-224). The regex
pattern strings are data (they define which document lines count as section
bullets/titles) and are kept identical so classification parity holds.
"""

from __future__ import annotations

import re

# Four bullet "families" (rag/nlp/__init__.py:157-182): Chinese legal
# (编/章/节/条), numeric-decimal, Chinese enumerated, English PART/Chapter/
# Section/Article. bullets_category votes across families.
BULLET_PATTERN: list[list[str]] = [
    [
        r"第[零一二三四五六七八九十百0-9]+(分?编|部分)",
        r"第[零一二三四五六七八九十百0-9]+章",
        r"第[零一二三四五六七八九十百0-9]+节",
        r"第[零一二三四五六七八九十百0-9]+条",
        r"[\(（][零一二三四五六七八九十百]+[\)）]",
    ],
    [
        r"第[0-9]+章",
        r"第[0-9]+节",
        r"[0-9]{,2}[\. 、]",
        r"[0-9]{,2}\.[0-9]{,2}[^a-zA-Z/%~-]",
        r"[0-9]{,2}\.[0-9]{,2}\.[0-9]{,2}",
        r"[0-9]{,2}\.[0-9]{,2}\.[0-9]{,2}\.[0-9]{,2}",
    ],
    [
        r"第[零一二三四五六七八九十百0-9]+章",
        r"第[零一二三四五六七八九十百0-9]+节",
        r"[零一二三四五六七八九十百]+[ 、]",
        r"[\(（][零一二三四五六七八九十百]+[\)）]",
        r"[\(（][0-9]{,2}[\)）]",
    ],
    [
        r"PART (ONE|TWO|THREE|FOUR|FIVE|SIX|SEVEN|EIGHT|NINE|TEN)",
        r"Chapter (I+V?|VI*|XI|IX|X)",
        r"Section [0-9]+",
        r"Article [0-9]+",
    ],
]

_NOT_BULLET = [re.compile(p) for p in (r"0", r"[0-9]+ +[0-9~个只-]", r"[0-9]+\.{2,}")]


def not_bullet(line: str) -> bool:
    """Lines that merely *look* numbered (quantities, ranges, dot leaders)
    — rag/nlp/__init__.py:192-196."""
    return any(p.match(line) for p in _NOT_BULLET)


def bullets_category(sections: list[str]) -> int:
    """Vote the dominant bullet family; -1 when nothing matches
    (rag/nlp/__init__.py:199-213). Ties resolve to the *lowest* family index
    with the max count (strict-greater update)."""
    hits = [0] * len(BULLET_PATTERN)
    for i, family in enumerate(BULLET_PATTERN):
        for sec in sections:
            for p in family:
                if re.match(p, sec) and not not_bullet(sec):
                    hits[i] += 1
                    break
    best, best_hits = -1, 0
    for i, h in enumerate(hits):
        if h > best_hits:
            best, best_hits = i, h
    return best


def is_english(texts: list[str]) -> bool:
    """>80% of lines start with an ASCII-ish char (rag/nlp/__init__.py:
    216-224). Used for the eng flag when the input lang column is absent."""
    if not texts:
        return False
    eng = sum(
        1 for t in texts if re.match(r"[ `a-zA-Z.,':;/\"?<>!\(\)-]", t.strip())
    )
    return eng / len(texts) > 0.8


# Question-numbering patterns (rag/nlp/__init__.py:66-78), voted by
# qbullets_category for the QA template's bullet-structured documents.
QUESTION_PATTERN: list[str] = [
    r"第([零一二三四五六七八九十百0-9]+)问",
    r"第([零一二三四五六七八九十百0-9]+)条",
    r"[\(（]([零一二三四五六七八九十百]+)[\)）]",
    r"第([0-9]+)问",
    r"第([0-9]+)条",
    r"([0-9]{1,2})[\. 、]",
    r"([零一二三四五六七八九十百]+)[ 、]",
    r"[\(（]([0-9]{1,2})[\)）]",
    r"QUESTION (ONE|TWO|THREE|FOUR|FIVE|SIX|SEVEN|EIGHT|NINE|TEN)",
    r"QUESTION (I+V?|VI*|XI|IX|X)",
    r"QUESTION ([0-9]+)",
]


def qbullets_category(sections: list[str]) -> tuple[int, str]:
    """Vote the dominant question-numbering pattern
    (rag/nlp/__init__.py:139-154). Quirk kept: a pattern scores at most 1
    (the inner loop breaks on first matching section), and when nothing
    matches the result is (-1, QUESTION_PATTERN[-1])."""
    hits = [0] * len(QUESTION_PATTERN)
    for i, pattern in enumerate(QUESTION_PATTERN):
        for sec in sections:
            if re.match(pattern, sec) and not not_bullet(sec):
                hits[i] += 1
                break
    best, best_hits = -1, 0
    for i, h in enumerate(hits):
        if h > best_hits:
            best, best_hits = i, h
    return best, QUESTION_PATTERN[best]


def not_title(txt: str) -> bool:
    """A line too long / too sentence-like to be a heading
    (rag/nlp/__init__.py:380-387)."""
    if re.match(r"第[零一二三四五六七八九十百0-9]+条", txt):
        return False
    if len(txt.split(" ")) > 12 or (txt.find(" ") < 0 and len(txt) >= 32):
        return True
    return bool(re.search(r"[,;，。；！!]", txt))
