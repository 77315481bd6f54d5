"""Plain-text / code-file parser.

Models ``RAGFlowTxtParser`` (deepdoc/parser/txt_parser.py:20-56): regex-split
on a configurable delimiter set, then greedy token-budget merge with the same
strictly-greater budget test as naive_merge.

Quirk kept from the reference (txt_parser.py:41-52): the delimiter string may
contain backtick-quoted multi-char delimiters — the loop *parses* them into
``dels`` but then immediately rebuilds ``dels`` from the raw single
characters of ``delimiter`` (including the backticks themselves), discarding
the multi-char groups. Observed behavior is therefore "split on every
individual character of the delimiter string"; we reproduce that.
"""

from __future__ import annotations

import re

from ragflow_spark.core.codec import decode_bytes
from ragflow_spark.core.tokens import num_tokens_from_string

DEFAULT_DELIMITER = "\n!?;。；！？"


def split_sections(txt: str, delimiter: str = DEFAULT_DELIMITER) -> list[str]:
    """The delimiter split, delimiters kept as their own list entries
    (capturing-group re.split, txt_parser.py:51-52)."""
    dels = [re.escape(d) for d in delimiter if d]
    if not dels:
        return [txt]
    pattern = "|".join(dels)
    return re.split(r"(%s)" % pattern, txt)


def parse_txt(
    txt: str,
    chunk_token_num: int = 128,
    delimiter: str = DEFAULT_DELIMITER,
) -> list[list[str]]:
    """Equivalent of ``RAGFlowTxtParser.parser_txt`` — returns
    ``[[chunk_text, ""], ...]`` section pairs."""
    if not isinstance(txt, str):
        raise TypeError("txt type should be str!")
    chunks = [""]
    token_counts = [0]
    for piece in split_sections(txt, delimiter):
        tnum = num_tokens_from_string(piece)
        if token_counts[-1] > chunk_token_num:
            chunks.append(piece)
            token_counts.append(tnum)
        else:
            chunks[-1] += piece
            token_counts[-1] += tnum
    return [[c, ""] for c in chunks]


def parse_txt_bytes(
    blob: bytes, chunk_token_num: int = 128, delimiter: str = DEFAULT_DELIMITER
) -> list[list[str]]:
    return parse_txt(decode_bytes(blob), chunk_token_num, delimiter)
