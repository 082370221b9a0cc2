"""BMP codec (sources/bmp.py) — the fourth real in-sandbox image format."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from frontera_spark.sources.bmp import decode_bmp, encode_bmp


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (16, 16), (17, 31), (9, 2)])
def test_roundtrip_lossless(h, w):
    px = _img(h, w, seed=h * 10 + w)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_row_padding_exact():
    # w=3 -> 9-byte rows padded to 12: padding must not leak into pixels
    px = _img(4, 3, seed=1)
    b = encode_bmp(px)
    assert (len(b) - 54) == 4 * 12
    assert np.array_equal(decode_bmp(b), px)


def test_top_down_and_32bit_decode():
    """Hand-build a top-down 32-bit BMP (another encoder's common shape)."""
    px = _img(2, 2, seed=3)
    bgra = np.zeros((2, 2, 4), dtype=np.uint8)
    bgra[..., :3] = px[..., ::-1]
    data = bgra.tobytes()  # top-down, 32bpp: stride == w*4, no padding
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, len(data), 0, 0, 0, 0)
    assert np.array_equal(decode_bmp(header + info + data), px)


def test_error_paths():
    with pytest.raises(ValueError):
        decode_bmp(b"notabmp")
    px = _img(4, 4)
    b = bytearray(encode_bmp(px))
    with pytest.raises(ValueError):
        decode_bmp(bytes(b[:40]))  # truncated
    b8 = bytearray(encode_bmp(px))
    struct.pack_into("<H", b8, 28, 8)  # claim 8bpp (paletted)
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(b8))
    brle = bytearray(encode_bmp(px))
    struct.pack_into("<I", brle, 30, 1)  # claim RLE8
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(brle))


def test_fuzzed_bmps_terminate():
    rng = np.random.default_rng(55)
    base = bytearray(encode_bmp(_img(12, 12, seed=8)))
    for _ in range(200):
        b = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            out = decode_bmp(bytes(b))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError, struct.error):
            pass
    for cut in range(2, len(base), 17):
        try:
            decode_bmp(bytes(base[:cut]))
        except (ValueError, NotImplementedError, struct.error):
            pass


def test_dispatcher_routes_bmp():
    from frontera_spark.operators.multimodal import decode_image

    px = _img(8, 8, seed=9)
    assert np.array_equal(decode_image(encode_bmp(px)), px)
