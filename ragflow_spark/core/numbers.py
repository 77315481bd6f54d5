"""Number-word parsing (SURVEY §2.7 X6).

Models ``index_int`` (rag/nlp/__init__.py:122-137): try plain int, then
English number words (word2number), then Chinese numerals (cn2an), then
roman numerals — first success wins, -1 when nothing parses. The external
packages are replaced by small self-contained converters covering the
bullet/question-numbering range the reference actually feeds this function
(QUESTION_PATTERN captures: digits, 零一二三四五六七八九十百, ONE..TEN,
roman I..X-ish).
"""

from __future__ import annotations

import re

_EN_UNITS = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
    "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19,
}
_EN_TENS = {
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50, "sixty": 60,
    "seventy": 70, "eighty": 80, "ninety": 90,
}
_CN_DIGITS = {"零": 0, "一": 1, "二": 2, "三": 3, "四": 4, "五": 5,
              "六": 6, "七": 7, "八": 8, "九": 9}
_ROMAN = {"I": 1, "V": 5, "X": 10, "L": 50, "C": 100, "D": 500, "M": 1000}


def word_to_num(s: str) -> int:
    """English number words up to 999 ('twenty one', 'one hundred five')."""
    words = re.split(r"[\s-]+", s.strip().lower())
    if not words or not all(
        w in _EN_UNITS or w in _EN_TENS or w in ("hundred", "and") for w in words
    ):
        raise ValueError(s)
    total = current = 0
    seen = False
    for w in words:
        if w == "and":
            continue
        if w == "hundred":
            if not seen:
                raise ValueError(s)
            current *= 100
        elif w in _EN_TENS:
            current += _EN_TENS[w]
            seen = True
        else:
            current += _EN_UNITS[w]
            seen = True
    return total + current


def cn_to_num(s: str) -> int:
    """Chinese numerals 零..九百九十九 (the 零一..百 range of the patterns)."""
    s = s.strip()
    if not s or not all(c in _CN_DIGITS or c in "十百" for c in s):
        raise ValueError(s)
    total = 0
    num = 0
    for c in s:
        if c in _CN_DIGITS:
            num = _CN_DIGITS[c]
        elif c == "十":
            total += (num or 1) * 10
            num = 0
        elif c == "百":
            total += (num or 1) * 100
            num = 0
    return total + num


def roman_to_num(s: str) -> int:
    s = s.strip().upper()
    if not s or not all(c in _ROMAN for c in s):
        raise ValueError(s)
    total = 0
    for i, c in enumerate(s):
        v = _ROMAN[c]
        if i + 1 < len(s) and _ROMAN[s[i + 1]] > v:
            total -= v
        else:
            total += v
    return total


def index_int(index_str: str) -> int:
    """The reference's fallback chain (rag/nlp/__init__.py:122-137)."""
    try:
        return int(index_str)
    except (TypeError, ValueError):
        pass
    for fn in (word_to_num, cn_to_num, roman_to_num):
        try:
            return fn(index_str)
        except (TypeError, ValueError):
            continue
    return -1
