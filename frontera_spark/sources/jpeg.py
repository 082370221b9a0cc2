"""Pure numpy baseline JPEG (JFIF) encoder/decoder.

ITU-T T.81 baseline sequential DCT, 8-bit, Huffman entropy coding — the
public spec only. PIL/libjpeg are not installed in this environment
(SURVEY.md §7.3 M0), so this module makes the 'jpeg' payload format REAL
for the image+caption corpus: fetch-stage per-row invariants can check
decoded-pixel PSNR >= 40 dB on a genuinely lossy codec (the BASELINE
input_hint's "PSNR>=40dB for lossy" clause), not just the quantize-then-PNG
stand-in.

Supported:
- encode: 3-component YCbCr, 4:4:4 or 4:2:0 subsampling, IJG-style quality
  scaling of the Annex-K quantization tables, Annex-K standard Huffman
  tables, optional restart intervals (DRI + RSTn).
- decode: baseline SOF0/SOF1, 1 or 3 components, any integer subsampling
  ratio of Hmax/Hi (covers 4:4:4, 4:2:2, 4:2:0), DQT 8/16-bit, multiple
  tables per DQT/DHT segment, restart markers, APPn/COM skip. Progressive
  (SOF2) and arithmetic coding raise ValueError.

Performance notes (this is a mapInPandas inner loop, not a driver loop):
the DCT/IDCT, quantization, and color transforms are vectorized numpy over
all 8x8 blocks at once; only the entropy coding is per-symbol Python, with
a 16-bit prefix lookup table (libjpeg's strategy) so Huffman decode is one
list index per symbol instead of bit-by-bit tree walking.

frontera parity note: frontera is payload-agnostic (SURVEY.md §0); the
codec exists for the graft's image-payload invariant, not for any frontera
surface.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position k -> raster index in the 8x8 block (T.81 Figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 example quantization tables (raster order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3 standard Huffman tables: (bits[16], values)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.sqrt(2.0 / 8) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 16)
    c[0, :] = np.sqrt(1.0 / 8)
    return c


_DCT = _dct_matrix()


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling: 1..100; 50 = Annex-K tables, 100 = all-ones."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q

    def s(base: np.ndarray) -> np.ndarray:
        return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)

    return s(_QT_LUMA), s(_QT_CHROMA)


def _build_encode_table(bits: list[int], values: list[int]) -> list[tuple[int, int] | None]:
    """Canonical Huffman codes (T.81 Annex C) as a symbol-indexed list."""
    table: list[tuple[int, int] | None] = [None] * 256
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


# decode LUTs are pure functions of the DHT payload; memoize across images
# (every corpus image carries the same Annex-K tables)
_LUT_CACHE: dict[bytes, tuple[list[int], list[int]]] = {}


def _build_decode_lut(bits: list[int], values: list[int]) -> tuple[list[int], list[int]]:
    """16-bit prefix lookup: index by the next 16 bits, get (symbol, length)."""
    key = bytes(bits) + bytes(values)
    cached = _LUT_CACHE.get(key)
    if cached is not None:
        return cached
    sym = [0] * 65536
    ln = [0] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            v = values[k]
            sym[lo:hi] = [v] * (hi - lo)
            ln[lo:hi] = [length] * (hi - lo)
            k += 1
            code += 1
        code <<= 1
    if len(_LUT_CACHE) < 64:  # bound the memo; 4 tables in practice
        _LUT_CACHE[key] = (sym, ln)
    return sym, ln


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1-bits


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return y, cb, cr


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % mult, (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _quantized_zigzag_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(H,W) float plane (H,W multiples of 8) -> (by, bx, 64) int32 zigzag
    coefficients. DCT + quantize vectorized over every block at once."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) - 128.0
    coef = _DCT @ blocks @ _DCT.T
    qz = np.rint(coef / qt).astype(np.int32)
    return qz.reshape(h // 8, w // 8, 64)[..., ZIGZAG]


def _encode_block(bw: _BitWriter, zz: list, pred: int, dc, ac) -> int:
    v0 = zz[0]
    diff = v0 - pred
    if diff == 0:
        c, l = dc[0]
        bw.write(c, l)
    else:
        s = (diff if diff > 0 else -diff).bit_length()
        c, l = dc[s]
        bw.write(c, l)
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last = k
            break
    for k in range(1, last + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, l = ac[0xF0]  # ZRL
            bw.write(c, l)
            run -= 16
        s = (v if v > 0 else -v).bit_length()
        c, l = ac[(run << 4) | s]
        bw.write(c, l)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        c, l = ac[0x00]  # EOB
        bw.write(c, l)
    return v0


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """RGB uint8 (h, w, 3) -> baseline JFIF JPEG bytes.

    quality: IJG 1..100 scaling of the Annex-K tables (100 = all-ones —
    near-lossless, only DCT rounding error; the corpus's lossy slice uses
    this so PSNR >= 40 dB holds even on noise images).
    subsampling: "4:4:4" (no chroma subsampling) or "4:2:0" (2x2 box mean).
    restart_interval: if > 0, emit DRI and an RSTn marker every that many
    MCUs (exercises the decoder's restart/resync path)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected uint8 (h, w, 3) RGB array")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    h, w = pixels.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("image dims must be 1..65535")
    qt_l, qt_c = _scaled_tables(quality)
    y, cb, cr = _rgb_to_ycbcr(pixels)

    if subsampling == "4:2:0":
        samp = ((2, 2), (1, 1), (1, 1))
        y = _pad_edge(y, 16)
        cb = _pad_edge(cb, 16)
        cr = _pad_edge(cr, 16)
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        samp = ((1, 1), (1, 1), (1, 1))
        y, cb, cr = _pad_edge(y, 8), _pad_edge(cb, 8), _pad_edge(cr, 8)

    planes = (
        _quantized_zigzag_blocks(y, qt_l),
        _quantized_zigzag_blocks(cb, qt_c),
        _quantized_zigzag_blocks(cr, qt_c),
    )

    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _seg(
        0xDB,
        bytes([0x00]) + bytes(qt_l.flatten()[ZIGZAG].astype(np.uint8))
        + bytes([0x01]) + bytes(qt_c.flatten()[ZIGZAG].astype(np.uint8)),
    )
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, (hi, vi), tq in zip((1, 2, 3), samp, (0, 1, 1)):
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xC0, bytes(sof))
    dht = bytearray()
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        dht += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    out += _seg(0xC4, bytes(dht))
    if restart_interval > 0:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([3])
    for cid, tdta in zip((1, 2, 3), (0x00, 0x11, 0x11)):
        sos += bytes([cid, tdta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))

    # entropy-coded scan
    enc_tables = (
        (_build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
         _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)),
        (_build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
         _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)),
    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    zz_lists = [p.tolist() for p in planes]
    bw = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval > 0 and mcu_count > 0 and mcu_count % restart_interval == 0:
                bw.pad_to_byte()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for ci, (hi, vi) in enumerate(samp):
                dc, ac = enc_tables[0 if ci == 0 else 1]
                for v in range(vi):
                    for u in range(hi):
                        zz = zz_lists[ci][my * vi + v][mx * hi + u]
                        preds[ci] = _encode_block(bw, zz, preds[ci], dc, ac)
            mcu_count += 1
    bw.pad_to_byte()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-scan bit reader: unstuffs 0xFF00, never consumes a real
    marker (fills with 0-bits at a marker/end so 16-bit peeks stay legal),
    resyncs at RSTn via restart()."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        d = self.data
        while self.n < need:
            p = self.pos
            if p < len(d):
                b = d[p]
                if b == 0xFF:
                    nxt = d[p + 1] if p + 1 < len(d) else 0xD9
                    if nxt == 0x00:
                        self.pos = p + 2
                        self.acc = (self.acc << 8) | 0xFF
                        self.n += 8
                        continue
                    # real marker: do not consume; pad
                    self.acc <<= 8
                    self.n += 8
                    continue
                self.pos = p + 1
                self.acc = (self.acc << 8) | b
                self.n += 8
            else:
                self.acc <<= 8
                self.n += 8

    def read_symbol(self, sym: list[int], ln: list[int]) -> int:
        self._fill(16)
        idx = (self.acc >> (self.n - 16)) & 0xFFFF
        length = ln[idx]
        if length == 0:
            raise ValueError("invalid Huffman code in entropy stream")
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return sym[idx]

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        self._fill(s)
        v = (self.acc >> (self.n - s)) & ((1 << s) - 1)
        self.n -= s
        self.acc &= (1 << self.n) - 1
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v

    def restart(self) -> None:
        self.acc = 0
        self.n = 0
        d = self.data
        if not (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> RGB uint8 (h, w, 3)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}  # id -> 64 values, zigzag order
    dec_tables: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, Hi, Vi, Tq)
    h = w = 0
    restart_interval = 0
    scan_pos = -1
    scan_map: list[tuple[int, int]] = []  # per comp: (Td, Ta)
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte
            pos -= 1
            continue
        if marker in (0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
            if marker == 0xD9:
                break
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2:  # a zero/one-length segment would stall the parser
            raise ValueError(f"malformed segment length {seglen}")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                qtables[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            _prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):  # T.81 B.2.2 bounds
                    raise ValueError(f"invalid sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, tq))
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            if h == 0 or w == 0:
                raise ValueError("zero image dimension")
        elif marker == 0xC2:
            raise ValueError("progressive JPEG (SOF2) not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0x{marker:02x}")
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                dec_tables[(cls, tid)] = _build_decode_lut(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            order = {cid: (td_ta >> 4, td_ta & 0x0F)
                     for cid, td_ta in zip(body[1:1 + 2 * ns:2], body[2:2 + 2 * ns:2])}
            for cid, _, _, _ in comps:
                if cid not in order:
                    raise ValueError(f"SOS missing component {cid}")
            scan_map = [order[c[0]] for c in comps]
            scan_pos = pos
            break
        # else: APPn / COM — skipped
    if scan_pos < 0 or not comps:
        raise ValueError("no scan found")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coef_planes = [
        np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for (_, hi, vi, _) in comps
    ]
    for _, _, _, tq in comps:
        if tq not in qtables:
            raise ValueError(f"missing quantization table {tq}")
    for ci in range(len(comps)):
        td, ta = scan_map[ci]
        if (0, td) not in dec_tables or (1, ta) not in dec_tables:
            raise ValueError(f"missing Huffman table (dc={td}, ac={ta})")
    qt_per_comp = [qtables[tq] for (_, _, _, tq) in comps]
    br = _BitReader(data, scan_pos)
    preds = [0] * len(comps)
    blk = np.zeros(64, dtype=np.float64)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval > 0 and mcu_count > 0 and mcu_count % restart_interval == 0:
                br.restart()
                preds = [0] * len(comps)
            for ci, (_, hi, vi, _) in enumerate(comps):
                td, ta = scan_map[ci]
                dsym, dln = dec_tables[(0, td)]
                asym, aln = dec_tables[(1, ta)]
                qt = qt_per_comp[ci]
                for v in range(vi):
                    for u in range(hi):
                        s = br.read_symbol(dsym, dln)
                        preds[ci] += br.receive_extend(s)
                        blk[:] = 0.0
                        blk[0] = preds[ci] * qt[0]
                        k = 1
                        while k < 64:
                            rs = br.read_symbol(asym, aln)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            blk[k] = br.receive_extend(s) * qt[k]
                            k += 1
                        by, bx = my * vi + v, mx * hi + u
                        raster = np.zeros(64, dtype=np.float64)
                        raster[ZIGZAG] = blk
                        coef_planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                            raster.reshape(8, 8)
                        )
            mcu_count += 1

    # IDCT each component (vectorized over all blocks), upsample, color
    out_planes = []
    for ci, (_, hi, vi, _) in enumerate(comps):
        plane = coef_planes[ci]
        ph, pw = plane.shape
        blocks = plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        pix = _DCT.T @ blocks @ _DCT + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(ph, pw)
        ch = (h * vi + vmax - 1) // vmax
        cw = (w * hi + hmax - 1) // hmax
        plane = plane[:ch, :cw]
        if vmax % vi or hmax % hi:
            raise ValueError("non-integer subsampling ratio not supported")
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        y = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
