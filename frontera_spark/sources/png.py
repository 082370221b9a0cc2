"""Minimal pure numpy+zlib PNG encoder/decoder.

PIL is not installed in this environment (SURVEY.md §7.3 M0), so the
image+caption corpus carries real, spec-conformant PNG bytes produced here.
Supports 8-bit RGB (color type 2), filter types 0 (encode) and 0-4 (decode —
robustness for any conformant re-encoder). Public PNG spec (RFC 2083) only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """RGB uint8 (h, w, 3) array → PNG bytes (filter 0 scanlines)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected uint8 (h, w, 3) RGB array")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB, no interlace
    # prepend filter byte 0 to each scanline, vectorized
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → RGB uint8 (h, w, 3). Handles filters 0-4, color type 2."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    idat = bytearray()
    h = bit_depth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if bit_depth != 8 or color_type != 2 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced RGB supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, scan = line[0], np.frombuffer(line[1:], dtype=np.uint8).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            scan = (scan.astype(np.int16) + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need sequential left pixel
            scan = _unfilter_sequential(ftype, scan, prev)
        else:
            raise ValueError(f"bad filter {ftype}")
        out[y] = scan
        prev = out[y]
    return out.reshape(h, w, 3)


def _unfilter_sequential(ftype: int, scan: np.ndarray, prev: np.ndarray) -> np.ndarray:
    bpp = 3
    s = scan.astype(np.int32)
    p = prev.astype(np.int32)
    out = np.zeros_like(s)
    for i in range(len(s)):
        a = out[i - bpp] if i >= bpp else 0
        b = p[i]
        c = p[i - bpp] if i >= bpp else 0
        if ftype == 1:
            out[i] = (s[i] + a) & 0xFF
        elif ftype == 3:
            out[i] = (s[i] + (a + b) // 2) & 0xFF
        else:  # Paeth
            pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (s[i] + pred) & 0xFF
    return out.astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
