"""Chunk-merge algorithms (the token-window "C" operators of SURVEY.md §2.6).

Models rag/nlp/__init__.py: ``naive_merge`` (:481-511), ``hierarchical_merge``
(:390-478), ``title_frequency`` (:360-379), ``make_colon_as_title``
(:338-357), ``remove_contents_table`` (:306-335).

Behavioral contract preserved exactly:
- naive_merge starts a new chunk only when the running chunk token count is
  already STRICTLY GREATER than the budget (so chunks overshoot by one
  section) and appends the position tag at most once per chunk, skipping it
  for sections under 8 tokens.
- hierarchical_merge buckets sections by bullet level, walks the top
  ``depth`` levels most-significant-first, binary-searching the most recent
  ancestor at every deeper level; singleton chapter-chunks are re-packed
  while under 218 tokens.
"""

from __future__ import annotations

import re
from collections import Counter

from ragflow_spark.core.patterns import BULLET_PATTERN, not_bullet, not_title
from ragflow_spark.core.tokens import num_tokens_from_string

Section = tuple[str, str]  # (text, tag) — tag is a layout name or "@@..##" pos tag


def _as_pairs(sections) -> list[Section]:
    if sections and isinstance(sections[0], str):
        return [(s, "") for s in sections]
    return list(sections)


def naive_merge(
    sections, chunk_token_num: int = 128, delimiter: str = "\n。；！？"
) -> list[str]:
    """Greedy token-window merge (rag/nlp/__init__.py:481-511).

    ``delimiter`` is accepted for signature parity; like the reference, it is
    unused here (splitting happened upstream in the per-format parser)."""
    if not sections:
        return []
    sections = _as_pairs(sections)
    chunks: list[str] = [""]
    token_counts: list[int] = [0]

    for text, pos in sections:
        tnum = num_tokens_from_string(text)
        if not pos or tnum < 8:
            pos = ""
        if token_counts[-1] > chunk_token_num:
            # budget already exceeded → seal previous chunk, open a new one
            if text.find(pos) < 0:
                text += pos
            chunks.append(text)
            token_counts.append(tnum)
        else:
            # tag-once-per-chunk: skip the tag if the chunk already holds it
            if chunks[-1].find(pos) < 0:
                text += pos
            chunks[-1] += text
            token_counts[-1] += tnum
    return chunks


def title_frequency(bull: int, sections) -> tuple[int, list[int]]:
    """Assign a bullet level to every section and return the most frequent
    real level as the merge pivot (rag/nlp/__init__.py:360-379)."""
    bullets_size = len(BULLET_PATTERN[bull]) if 0 <= bull < len(BULLET_PATTERN) else 0
    levels = [bullets_size + 1] * len(sections)
    if not sections or bull < 0:
        return bullets_size + 1, levels

    for i, (txt, layout) in enumerate(sections):
        for j, p in enumerate(BULLET_PATTERN[bull]):
            if re.match(p, txt.strip()) and not not_bullet(txt):
                levels[i] = j
                break
        else:
            if re.search(r"(title|head)", layout) and not not_title(txt.split("@")[0]):
                levels[i] = bullets_size
    most_level = bullets_size + 1
    for lvl, _cnt in sorted(Counter(levels).items(), key=lambda kv: -kv[1]):
        if lvl <= bullets_size:
            most_level = lvl
            break
    return most_level, levels


def _binary_search_le(arr: list[int], target: int) -> int:
    """Index of the greatest element strictly below ``target``'s bucket —
    the ancestor lookup of hierarchical_merge (rag/nlp/__init__.py:414-431).
    ``target`` is never a member of ``arr``."""
    if not arr:
        return -1
    if target > arr[-1]:
        return len(arr) - 1
    if target < arr[0]:
        return -1
    lo, hi = 0, len(arr)
    while hi - lo > 1:
        mid = (hi + lo) // 2
        if target > arr[mid]:
            lo = mid
        else:
            hi = mid
    return lo


def hierarchical_merge(bull: int, sections, depth: int) -> list[list[str]]:
    """Chapter-path merge (rag/nlp/__init__.py:390-478). Returns a list of
    chunks, each a list of section texts root-first."""
    if not sections or bull < 0:
        return []
    sections = _as_pairs(sections)
    # drop empties / pure page numbers (len<=1 after tag strip, digits-only)
    sections = [
        (t, o)
        for t, o in sections
        if t
        and len(t.split("@")[0].strip()) > 1
        and not re.match(r"[0-9]+$", t.split("@")[0].strip())
    ]
    bullets_size = len(BULLET_PATTERN[bull])
    levels: list[list[int]] = [[] for _ in range(bullets_size + 2)]

    for i, (txt, layout) in enumerate(sections):
        for j, p in enumerate(BULLET_PATTERN[bull]):
            if re.match(p, txt.strip()):
                levels[j].append(i)
                break
        else:
            if re.search(r"(title|head)", layout) and not not_title(txt):
                levels[bullets_size].append(i)
            else:
                levels[bullets_size + 1].append(i)
    texts = [t for t, _ in sections]

    chunks_idx: list[list[int]] = []
    consumed = [False] * len(texts)
    levels = levels[::-1]  # deepest-first, walk top `depth` reversed levels
    for i, bucket in enumerate(levels[:depth]):
        for j in bucket:
            if consumed[j]:
                continue
            consumed[j] = True
            chunks_idx.append([j])
            if i + 1 == len(levels) - 1:
                continue
            for ii in range(i + 1, len(levels)):
                jj = _binary_search_le(levels[ii], j)
                if jj < 0:
                    continue
                # quirk kept from the reference: compares the bucket-local
                # index jj against the last *section* index
                if jj > chunks_idx[-1][-1]:
                    chunks_idx[-1].pop(-1)
                chunks_idx[-1].append(levels[ii][jj])
            for ii in chunks_idx[-1]:
                consumed[ii] = True

    if not chunks_idx:
        return []

    chunks = [[texts[j] for j in idxs[::-1]] for idxs in chunks_idx]

    # re-pack singleton chunks while under the 218-token ceiling
    packed: list[list[str]] = [[]]
    packed_tokens = [0]
    for ck in chunks:
        if len(ck) == 1:
            n = num_tokens_from_string(re.sub(r"@@[0-9]+.*", "", ck[0]))
            if n + packed_tokens[-1] < 218:
                packed[-1].append(ck[0])
                packed_tokens[-1] += n
                continue
            packed.append(ck)
            packed_tokens.append(n)
            continue
        packed.append(ck)
        packed_tokens.append(218)
    return packed


def make_colon_as_title(sections) -> list:
    """Promote the clause before a trailing colon into a synthetic title
    section (rag/nlp/__init__.py:338-357). Mutates and returns ``sections``."""
    if not sections:
        return []
    if isinstance(sections[0], str):
        return sections
    i = 0
    while i < len(sections):
        txt, _layout = sections[i]
        i += 1
        txt = txt.split("@")[0].strip()
        if not txt or txt[-1] not in ":：":
            continue
        reversed_txt = txt[::-1]
        arr = re.split(r"([。？！!?;；]| \.)", reversed_txt)
        if len(arr) < 2 or len(arr[1]) < 32:
            continue
        sections.insert(i - 1, (arr[0][::-1], "title"))
        i += 1
    return sections


def remove_contents_table(sections, eng: bool = False) -> None:
    """Delete a table-of-contents block: the heading plus every following
    entry sharing the first entry's prefix (rag/nlp/__init__.py:306-335).
    Mutates ``sections`` in place."""
    i = 0
    while i < len(sections):

        def get(k):
            entry = sections[k]
            return (entry if isinstance(entry, str) else entry[0]).strip()

        # quirk kept from the reference: re.IGNORECASE is passed positionally
        # as `count`, so only the first 2 whitespace runs are stripped and
        # matching stays case-sensitive
        header = re.sub(r"( |\u3000)+", "", get(i).split("@@")[0], 2)
        if not re.match(
            r"(contents|目录|目次|table of contents|致谢|acknowledge)$", header
        ):
            i += 1
            continue
        sections.pop(i)
        if i >= len(sections):
            break
        prefix = get(i)[:3] if not eng else " ".join(get(i).split(" ")[:2])
        while not prefix:
            sections.pop(i)
            if i >= len(sections):
                break
            prefix = get(i)[:3] if not eng else " ".join(get(i).split(" ")[:2])
        sections.pop(i)
        if i >= len(sections) or not prefix:
            break
        for j in range(i, min(i + 128, len(sections))):
            if not re.match(prefix, get(j)):
                continue
            for _ in range(i, j):
                sections.pop(i)
            break
