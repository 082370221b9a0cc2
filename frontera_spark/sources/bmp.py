"""Minimal pure-numpy BMP (Windows DIB) encoder/decoder.

Fourth real in-sandbox image codec: uncompressed 24-bit and 32-bit
BITMAPINFOHEADER bitmaps, bottom-up and top-down row order — the common
shapes a crawler actually meets. RLE and paletted BMPs raise
NotImplementedError. Public Windows BMP file-format layout only.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) -> 24-bit bottom-up BMP bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected uint8 (h, w, 3) RGB array")
    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> RGB uint8 (h, w, 3). Uncompressed 24/32-bit only."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS (assume natural order)
        raise NotImplementedError(f"BMP compression {compression} not supported")
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP not supported (24/32 only)")
    if w <= 0 or h_signed == 0 or planes != 1:
        raise ValueError("malformed BMP dimensions")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    need = offset + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    rgb = rows[..., 2::-1]  # BGR(A) -> RGB, alpha dropped
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)
