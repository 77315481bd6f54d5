"""Charset detection.

Models the reference's trial-decode loop ``find_codec``
(``rag/nlp/__init__.py:31-64``): try a fixed codec list against the first
1 KiB, then against the whole blob; first success wins; fall back to utf-8.

The codec *order* is behavior — gb2312 is tried before gbk/gb18030, so a
GB-encoded page decodes with the first GB codec that accepts it, exactly as
the reference does. We keep the same ordering (it is just a list of codec
names, i.e. data, not code).
"""

from __future__ import annotations

from functools import lru_cache

# Same trial order as the reference (rag/nlp/__init__.py:31-48). Note the
# reference list contains the literal concatenation 'utf_32_le''utf_16_be'
# (a typo producing the invalid codec name "utf_32_leutf_16_be"); that entry
# can never decode anything, so omitting it is behavior-preserving.
CODEC_TRIAL_ORDER: tuple[str, ...] = (
    "utf-8", "gb2312", "gbk", "utf_16", "ascii", "big5", "big5hkscs",
    "cp037", "cp273", "cp424", "cp437",
    "cp500", "cp720", "cp737", "cp775", "cp850", "cp852", "cp855", "cp856",
    "cp857", "cp858", "cp860", "cp861", "cp862", "cp863", "cp864", "cp865",
    "cp866", "cp869", "cp874", "cp875", "cp932", "cp949", "cp950", "cp1006",
    "cp1026", "cp1125", "cp1140", "cp1250", "cp1251", "cp1252", "cp1253",
    "cp1254", "cp1255", "cp1256", "cp1257", "cp1258", "euc_jp",
    "euc_jis_2004", "euc_jisx0213", "euc_kr", "gb2312", "gb18030", "hz",
    "iso2022_jp", "iso2022_jp_1", "iso2022_jp_2", "iso2022_jp_2004",
    "iso2022_jp_3", "iso2022_jp_ext", "iso2022_kr", "latin_1", "iso8859_2",
    "iso8859_3", "iso8859_4", "iso8859_5", "iso8859_6", "iso8859_7",
    "iso8859_8", "iso8859_9", "iso8859_10", "iso8859_11", "iso8859_13",
    "iso8859_14", "iso8859_15", "iso8859_16", "johab", "koi8_r", "koi8_t",
    "koi8_u", "kz1048", "mac_cyrillic", "mac_greek", "mac_iceland",
    "mac_latin2", "mac_roman", "mac_turkish", "ptcp154", "shift_jis",
    "shift_jis_2004", "shift_jisx0213", "utf_32", "utf_32_be", "utf_16_le",
    "utf_7",
)


@lru_cache(maxsize=1)
def _usable_codecs() -> tuple[str, ...]:
    """Codecs from the trial list that exist in this interpreter."""
    import codecs as _codecs

    out = []
    for name in CODEC_TRIAL_ORDER:
        try:
            _codecs.lookup(name)
            out.append(name)
        except LookupError:
            pass
    return tuple(out)


def find_codec(blob: bytes) -> str:
    """Return the first codec that decodes ``blob`` (head-1KiB first, then
    the whole blob), else ``"utf-8"``. Mirrors rag/nlp/__init__.py:50-64."""
    if not isinstance(blob, (bytes, bytearray)):
        return "utf-8"
    head = blob[:1024]
    for codec in _usable_codecs():
        try:
            head.decode(codec)
            return codec
        except Exception:
            pass
        try:
            bytes(blob).decode(codec)
            return codec
        except Exception:
            pass
    return "utf-8"


def decode_bytes(blob: bytes) -> str:
    """Decode with the detected codec, ignoring errors — the reference's
    standard ``binary.decode(find_codec(binary), errors="ignore")`` idiom
    (e.g. deepdoc/parser/html_parser.py:29-31)."""
    return bytes(blob).decode(find_codec(blob), errors="ignore")
