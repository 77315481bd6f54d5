"""Minimal BMP codec (24/32-bit uncompressed BI_RGB) — the one image
format decodable with zero native deps, giving the picture template
(rag/app/picture.py:27-35 ``Image.open(...).convert('RGB')``) a REAL
bytes→pixels path in this environment. Codecs for compressed formats
stay honestly stubbed per the multimodal contract
(operators/multimodal.py)."""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    pass


def decode_bmp(blob: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB. Supports the common uncompressed
    24/32-bit BI_RGB form, bottom-up (positive height) and top-down
    (negative height) row orders."""
    if len(blob) < 54 or blob[:2] != b"BM":
        raise BmpError("not a BMP file")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        raise BmpError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression})"
        )
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise BmpError("degenerate dimensions")
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) // 4 * 4
    need = data_off + stride * h
    if len(blob) < need:
        raise BmpError("truncated pixel data")
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    rgb = px[:, :, 2::-1]  # BGR(A) → RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp(im: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BMP bytes."""
    im = np.asarray(im, dtype=np.uint8)
    if im.ndim != 3 or im.shape[2] != 3:
        raise BmpError("expected (h, w, 3) RGB array")
    h, w = im.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = im[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, flip
    pixel_bytes = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixel_bytes), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835,
        0, 0,
    )
    return header + pixel_bytes
