"""S12: legacy binary Word (.doc) text extraction, from scratch.

The reference shells out to Apache Tika for ``.doc`` (rag/app/naive.py:277-284
— ``parser.from_buffer`` → split('\\n') → sections). Tika isn't vendorable
here, so this module implements the two PUBLISHED Microsoft specs the text
path needs:

- MS-CFB (Compound File Binary): 512-byte header, DIFAT → FAT sector
  chains, directory entries, mini-FAT/mini-stream for streams under the
  4096-byte cutoff.
- MS-DOC: the WordDocument stream's FIB (wIdent 0xA5EC; fWhichTblStm flag
  picks 0Table/1Table; fcClx/lcbClx at FIB offsets 418/422 for the Word97+
  FibRgFcLcb97 layout), the Clx/Pcdt piece table in the Table stream, and
  per-piece text decoding: PCD.fc bit 30 set → CP1252 bytes at fc/2,
  clear → UTF-16LE at fc.

Only text is recovered (no styles/tables/images — the reference's Tika
path likewise yields plain content lines). Paragraph marks (CR) become
newlines; Word's field/cell control characters are dropped.

``build_simple_doc`` writes a minimal spec-conformant fixture (one
uncompressed piece) so the parser is pinned end-to-end without binary
assets.
"""

from __future__ import annotations

import struct

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


class DocError(ValueError):
    pass


# ------------------------------------------------------------- CFB reader

def parse_cfb(blob: bytes) -> dict[str, bytes]:
    """Compound file → {stream name: bytes} for every stream entry."""
    if len(blob) < 512 or blob[:8] != MAGIC:
        raise DocError("not an OLE2 compound file")
    sect_shift = struct.unpack_from("<H", blob, 30)[0]
    mini_shift = struct.unpack_from("<H", blob, 32)[0]
    ssz, msz = 1 << sect_shift, 1 << mini_shift
    n_fat = struct.unpack_from("<I", blob, 44)[0]
    dir_start = struct.unpack_from("<I", blob, 48)[0]
    mini_cutoff = struct.unpack_from("<I", blob, 56)[0] or 4096
    minifat_start = struct.unpack_from("<I", blob, 60)[0]
    difat_start = struct.unpack_from("<I", blob, 68)[0]

    def sector(i: int) -> bytes:
        off = 512 + i * ssz
        return blob[off:off + ssz]

    # DIFAT: 109 entries in the header, then a chain of DIFAT sectors
    difat = list(struct.unpack_from("<109I", blob, 76))
    nxt = difat_start
    guard = 0
    while nxt not in (ENDOFCHAIN, FREESECT) and guard < 4096:
        s = sector(nxt)
        vals = struct.unpack(f"<{ssz // 4}I", s)
        difat.extend(vals[:-1])
        nxt = vals[-1]
        guard += 1
    fat_sectors = [x for x in difat if x != FREESECT][:n_fat]
    fat: list[int] = []
    for fs in fat_sectors:
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(fs)))

    def chain(start: int, table: list[int], reader) -> bytes:
        out, cur, guard = [], start, 0
        while cur not in (ENDOFCHAIN, FREESECT) and guard < len(table) + 2:
            out.append(reader(cur))
            if cur >= len(table):
                raise DocError("FAT chain out of range")
            cur = table[cur]
            guard += 1
        return b"".join(out)

    directory = chain(dir_start, fat, sector)
    # mini FAT + mini stream (root entry's chain holds the mini stream)
    minifat: list[int] = []
    if minifat_start not in (ENDOFCHAIN, FREESECT):
        mf = chain(minifat_start, fat, sector)
        minifat = list(struct.unpack(f"<{len(mf) // 4}I", mf))

    streams: dict[str, bytes] = {}
    root_start = root_size = None
    entries = []
    for off in range(0, len(directory) - 127, 128):
        e = directory[off:off + 128]
        name_len = struct.unpack_from("<H", e, 64)[0]
        if name_len < 2:
            continue
        name = e[: name_len - 2].decode("utf-16-le", "ignore")
        etype = e[66]
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<Q", e, 120)[0]
        if etype == 5:  # root storage → mini stream container
            root_start, root_size = start, size
        elif etype == 2:
            entries.append((name, start, size))

    mini_container = b""
    if root_start is not None and root_start not in (ENDOFCHAIN, FREESECT):
        mini_container = chain(root_start, fat, sector)[: root_size or None]

    def mini_sector(i: int) -> bytes:
        return mini_container[i * msz:(i + 1) * msz]

    for name, start, size in entries:
        if size < mini_cutoff and minifat:
            data = chain(start, minifat, mini_sector)
        else:
            data = chain(start, fat, sector)
        streams[name] = data[:size]
    return streams


# ------------------------------------------------------------- DOC reader

def extract_doc_text(blob: bytes) -> str:
    """WordDocument text via the Clx piece table; paragraph marks (CR)
    become '\\n', Word control characters are dropped."""
    streams = parse_cfb(blob)
    word = streams.get("WordDocument")
    if word is None or len(word) < 512:
        raise DocError("no WordDocument stream")
    if struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        raise DocError("bad FIB magic")
    flags = struct.unpack_from("<H", word, 0x0A)[0]
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name) or streams.get(
        "1Table" if table_name == "0Table" else "0Table"
    )
    fc_clx = struct.unpack_from("<I", word, 418)[0]
    lcb_clx = struct.unpack_from("<I", word, 422)[0]
    if table is None or lcb_clx == 0:
        raise DocError("no piece table")
    clx = table[fc_clx:fc_clx + lcb_clx]
    # Clx = RgPrc (clxt=0x01 blocks) followed by one Pcdt (clxt=0x02)
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:
        cb = struct.unpack_from("<h", clx, pos + 1)[0]
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise DocError("no Pcdt in Clx")
    lcb = struct.unpack_from("<I", clx, pos + 1)[0]
    plc = clx[pos + 5:pos + 5 + lcb]
    n = (lcb - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    out: list[str] = []
    for i in range(n):
        pcd = plc[4 * (n + 1) + 8 * i: 4 * (n + 1) + 8 * (i + 1)]
        fc_raw = struct.unpack_from("<I", pcd, 2)[0]
        n_chars = cps[i + 1] - cps[i]
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        if compressed:
            raw = word[fc // 2: fc // 2 + n_chars]
            out.append(raw.decode("cp1252", "replace"))
        else:
            raw = word[fc: fc + 2 * n_chars]
            out.append(raw.decode("utf-16-le", "replace"))
    text = "".join(out)
    # paragraph/line marks → '\n'; drop Word control chars (cell mark 0x07,
    # field delimiters 0x13-0x15, misc < 0x20 except tab)
    text = text.replace("\r\n", "\n").replace("\r", "\n").replace("\x0b", "\n")
    return "".join(
        ch for ch in text if ch == "\n" or ch == "\t" or ord(ch) >= 0x20
    )


# ------------------------------------------------------------- DOC writer

def _dir_entry(name: str, etype: int, start: int, size: int,
               left=FREESECT, right=FREESECT, child=FREESECT) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[:len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw))
    e[66] = etype
    e[67] = 1  # black
    struct.pack_into("<I", e, 68, left)
    struct.pack_into("<I", e, 72, right)
    struct.pack_into("<I", e, 76, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def build_simple_doc(paragraphs: list[str] | None = None,
                     compressed: bool = False,
                     pieces: list[tuple[str, bool]] | None = None,
                     mini_table: bool = False) -> bytes:
    """Minimal spec-conformant .doc. Default: one text piece, UTF-16, or
    CP1252 'compressed' (PCD.fc bit 30 + halved offset semantics) when
    ``compressed=True``.

    ``pieces=[(text, compressed), …]`` writes a MULTI-PIECE Pcdt — the
    shape Word fast-saves produce, with mixed CP1252/UTF-16 pieces and
    cumulative CPs counted in UTF-16 code units.

    ``mini_table=True`` stores the (small) Table stream in the CFB mini
    stream: mini-FAT chain of 64-byte sectors inside the root entry's
    container — the path real sub-4096-byte streams take. Default pads
    every stream past the cutoff onto the regular FAT path."""
    if pieces is None:
        pieces = [("\r".join(paragraphs or []), compressed)]

    payloads: list[bytes] = []
    fc_fields: list[int] = []
    cps: list[int] = [0]
    fc_text = 1024
    off = fc_text
    for text, comp in pieces:
        raw = text.encode("cp1252") if comp else text.encode("utf-16-le")
        # MS-DOC CPs count UTF-16 CODE UNITS (a non-BMP char is two), not
        # Python characters — the reader's 2*n_chars byte read depends on it
        cps.append(cps[-1] + (len(raw) if comp else len(raw) // 2))
        # compressed pieces carry fc = byte_offset*2 with bit 30 set
        fc_fields.append((off * 2) | 0x40000000 if comp else off)
        payloads.append(raw)
        off += len(raw)
    n_chars = cps[-1]

    word = bytearray(1024)
    struct.pack_into("<H", word, 0, 0xA5EC)      # wIdent
    struct.pack_into("<H", word, 2, 0x00C1)      # nFib (Word 97)
    struct.pack_into("<H", word, 0x0A, 0x0000)   # flags: 0Table
    struct.pack_into("<H", word, 32, 0x000E)     # csw
    struct.pack_into("<H", word, 62, 0x0016)     # cslw
    struct.pack_into("<I", word, 76, n_chars)    # ccpText
    struct.pack_into("<H", word, 152, 0x005D)    # cbRgFcLcb (Word 97)
    struct.pack_into("<I", word, 418, 0)         # fcClx

    plc = struct.pack(f"<{len(cps)}I", *cps) + b"".join(
        struct.pack("<HIH", 0, fc, 0) for fc in fc_fields
    )
    clx = bytes([0x02]) + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<I", word, 422, len(clx))  # lcbClx
    word_stream = bytes(word) + b"".join(payloads)

    table_stream = clx
    if mini_table:
        return _build_cfb_mini_table(word_stream, table_stream)

    def pad_sectors(b: bytes, unit: int = 512, floor: int = 4096) -> bytes:
        size = max(len(b), floor)
        size = (size + unit - 1) // unit * unit
        return b + b"\x00" * (size - len(b))

    word_padded = pad_sectors(word_stream)
    table_padded = pad_sectors(table_stream)
    n_word, n_table = len(word_padded) // 512, len(table_padded) // 512

    # layout: [FAT][DIR][word sectors][table sectors]
    fat_sect, dir_sect = 0, 1
    word_start = 2
    table_start = word_start + n_word
    total = table_start + n_table
    if total > 128:
        raise DocError("fixture too large for one FAT sector")

    fat = [FREESECT] * 128
    fat[fat_sect] = 0xFFFFFFFD  # FATSECT
    fat[dir_sect] = ENDOFCHAIN
    for i in range(n_word):
        fat[word_start + i] = word_start + i + 1
    fat[word_start + n_word - 1] = ENDOFCHAIN
    for i in range(n_table):
        fat[table_start + i] = table_start + i + 1
    fat[table_start + n_table - 1] = ENDOFCHAIN

    directory = (
        _dir_entry("Root Entry", 5, ENDOFCHAIN, 0, child=1)
        + _dir_entry("WordDocument", 2, word_start, len(word_stream),
                     right=2)
        + _dir_entry("0Table", 2, table_start, len(table_stream))
        + b"\x00" * 128
    )

    header = bytearray(512)
    header[:8] = MAGIC
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)        # 64-byte mini sectors
    struct.pack_into("<I", header, 44, 1)        # one FAT sector
    struct.pack_into("<I", header, 48, dir_sect)
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<I", header, 60, ENDOFCHAIN)  # no mini FAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    difat = [fat_sect] + [FREESECT] * 108
    struct.pack_into("<109I", header, 76, *difat)

    return (
        bytes(header)
        + struct.pack("<128I", *fat)
        + directory + b"\x00" * (512 - len(directory) % 512 if len(directory) % 512 else 0)
        + word_padded
        + table_padded
    )


def _build_cfb_mini_table(word_stream: bytes, table_stream: bytes) -> bytes:
    """CFB container with the Table stream in the MINI stream: 64-byte
    mini sectors chained through a mini FAT, the chain's bytes living in
    the root entry's container (itself a regular-FAT chain) — the layout
    real Word files use for every sub-4096-byte stream."""
    if len(table_stream) >= 4096:
        raise DocError("mini_table fixture requires table stream < 4096")

    def pad(b: bytes, unit: int) -> bytes:
        rem = len(b) % unit
        return b + b"\x00" * (unit - rem if rem else 0)

    # a CFB stream under the cutoff lives in the mini stream — size the
    # WordDocument stream itself past 4096 (real word streams are) so
    # only the Table stream exercises the mini path
    word_stream = word_stream + b"\x00" * max(0, 4096 - len(word_stream))
    word_padded = pad(word_stream, 512)
    n_word = len(word_padded) // 512

    container = pad(table_stream, 64)
    n_mini = len(container) // 64
    container_padded = pad(container, 512)
    n_container = len(container_padded) // 512

    # layout: [FAT][DIR][minifat][word sectors][container sectors]
    fat_sect, dir_sect, minifat_sect = 0, 1, 2
    word_start = 3
    container_start = word_start + n_word
    total = container_start + n_container
    if total > 128:
        raise DocError("fixture too large for one FAT sector")

    fat = [FREESECT] * 128
    fat[fat_sect] = 0xFFFFFFFD  # FATSECT
    fat[dir_sect] = ENDOFCHAIN
    fat[minifat_sect] = ENDOFCHAIN
    for i in range(n_word):
        fat[word_start + i] = word_start + i + 1
    fat[word_start + n_word - 1] = ENDOFCHAIN
    for i in range(n_container):
        fat[container_start + i] = container_start + i + 1
    fat[container_start + n_container - 1] = ENDOFCHAIN

    minifat = [FREESECT] * 128
    for i in range(n_mini):
        minifat[i] = i + 1
    minifat[n_mini - 1] = ENDOFCHAIN

    directory = (
        _dir_entry("Root Entry", 5, container_start, len(container),
                   child=1)
        + _dir_entry("WordDocument", 2, word_start, len(word_stream),
                     right=2)
        + _dir_entry("0Table", 2, 0, len(table_stream))  # mini chain @ 0
        + b"\x00" * 128
    )

    header = bytearray(512)
    header[:8] = MAGIC
    struct.pack_into("<H", header, 24, 0x003E)
    struct.pack_into("<H", header, 26, 0x0003)
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 9)        # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)        # 64-byte mini sectors
    struct.pack_into("<I", header, 44, 1)        # one FAT sector
    struct.pack_into("<I", header, 48, dir_sect)
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<I", header, 60, minifat_sect)
    struct.pack_into("<I", header, 64, 1)        # one mini-FAT sector
    struct.pack_into("<I", header, 68, ENDOFCHAIN)
    struct.pack_into("<I", header, 72, 0)
    difat = [fat_sect] + [FREESECT] * 108
    struct.pack_into("<109I", header, 76, *difat)

    return (
        bytes(header)
        + struct.pack("<128I", *fat)
        + directory + b"\x00" * (512 - len(directory) % 512 if len(directory) % 512 else 0)
        + struct.pack("<128I", *minifat)
        + word_padded
        + container_padded
    )
