"""GIF codec (sources/gif.py) + real animated-GIF frame demux through
operators/multimodal.sample_video_frames.

GIF is the third real in-sandbox codec (after PNG and baseline JPEG) and
the only genuinely multi-frame container decodable without ffmpeg, so it
upgrades the video-style frame-sampling op from a deterministic fake to a
real demuxer.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from frontera_spark.sources.gif import decode_gif, decode_gif_frames, encode_gif

# a well-known external 1x1 GIF byte string (the classic tracking pixel) —
# interop evidence that decode follows the spec, not just our own encoder
ONE_PX = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\x00\x00\x00\xff\xff\xff!\xf9\x04"
    b"\x01\x00\x00\x00\x00,\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;"
)


def _palette_img(h, w, levels=4, seed=0, step=80):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, levels, (h, w, 3)) * step).astype(np.uint8)


def test_external_one_pixel_gif():
    px = decode_gif(ONE_PX)
    assert px.shape == (1, 1, 3)
    assert px.tolist() == [[[0, 0, 0]]]


def test_roundtrip_lossless_few_colors():
    img = _palette_img(40, 56, seed=1)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_roundtrip_odd_dims_and_single_color():
    img = np.full((7, 13, 3), 200, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_over_256_colors_quantizes_to_666():
    noisy = np.random.default_rng(2).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = decode_gif(encode_gif(noisy))
    expected = ((noisy.astype(np.int32) // 51) * 51).astype(np.uint8)
    assert np.array_equal(out, expected)


def test_interlaced_roundtrip():
    img = _palette_img(33, 17, levels=5, seed=3, step=60)
    b = encode_gif(img, interlace=True)
    assert np.array_equal(decode_gif(b), img)


def test_animation_roundtrip_and_netscape_loop():
    frames = [_palette_img(24, 24, levels=3, seed=s, step=100) for s in range(5)]
    b = encode_gif(frames, delay_cs=10, loop=0)
    assert b"NETSCAPE2.0" in b
    dec = decode_gif_frames(b)
    assert len(dec) == 5
    assert all(np.array_equal(a, d) for a, d in zip(frames, dec))


def test_lzw_dict_reset_path():
    # 128x128 with 6 colors forces > 4096 LZW entries -> clear/reset mid-stream
    img = (np.random.default_rng(4).integers(0, 6, (128, 128, 3)) * 42).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_transparency_composites_over_previous_frame():
    """Hand-build a 2-frame GIF where frame 2 is a 1x2 patch with one
    transparent pixel: the transparent pixel must keep frame 1's color."""
    base = np.zeros((2, 2, 3), dtype=np.uint8)
    base[:, :] = (10, 20, 30)
    b = bytearray(encode_gif([base, base], delay_cs=1))
    # craft frame 2 manually: replace the second image block with a 2x1
    # top-left patch using transparent index 1
    # (simpler: decode our own 2-frame file, then verify composition rules
    #  via a minimal hand-written GIF instead)
    hand = bytearray()
    hand += b"GIF89a" + struct.pack("<HH", 2, 1)
    hand.append(0x80 | (7 << 4) | 0)  # GCT, 2 entries
    hand += b"\x00\x00"
    hand += bytes([255, 0, 0, 0, 255, 0])  # palette: red, green
    # frame 1: both pixels index 0 (red)
    hand += b"\x21\xf9\x04" + struct.pack("<BHB", 0, 1, 0) + b"\x00"
    hand.append(0x2C)
    hand += struct.pack("<HHHH", 0, 0, 2, 1) + b"\x00"
    from frontera_spark.sources.gif import _lzw_encode, _sub_blocks

    hand.append(2)
    hand += _sub_blocks(_lzw_encode(np.array([0, 0], dtype=np.uint8), 2))
    # frame 2: pixel0 transparent(idx1), pixel1 green(idx1 opaque)? use
    # transparent index 1 and data [1, 1]: pixel0 transparent -> stays red
    hand += b"\x21\xf9\x04" + struct.pack("<BHB", 1, 1, 1) + b"\x00"  # flags=1: transp idx 1
    hand.append(0x2C)
    hand += struct.pack("<HHHH", 0, 0, 2, 1) + b"\x00"
    hand.append(2)
    hand += _sub_blocks(_lzw_encode(np.array([1, 0], dtype=np.uint8), 2))
    hand.append(0x3B)
    frames = decode_gif_frames(bytes(hand))
    assert len(frames) == 2
    assert frames[0][0, 0].tolist() == [255, 0, 0]
    # pixel0 was transparent in frame 2 -> keeps red; pixel1 painted red(idx0)
    assert frames[1][0, 0].tolist() == [255, 0, 0]
    assert frames[1][0, 1].tolist() == [255, 0, 0]
    assert bytes(b)  # first crafted file still decodable
    assert len(decode_gif_frames(bytes(b))) == 2


def test_error_paths():
    with pytest.raises(ValueError):
        decode_gif(b"GIF10a" + b"\x00" * 20)
    with pytest.raises(ValueError):
        decode_gif(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        encode_gif([])
    with pytest.raises(ValueError):
        encode_gif([np.zeros((4, 4, 3), np.uint8), np.zeros((5, 4, 3), np.uint8)])


def test_fuzzed_gifs_terminate():
    rng = np.random.default_rng(77)
    base = bytearray(encode_gif(_palette_img(16, 16, seed=9)))
    for _ in range(200):
        b = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            out = decode_gif(bytes(b))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError, IndexError, struct.error):
            pass
    for cut in range(2, len(base), 31):
        try:
            decode_gif(bytes(base[:cut]))
        except (ValueError, IndexError, struct.error):
            pass


def test_decode_image_dispatches_gif():
    from frontera_spark.operators.multimodal import decode_image

    img = _palette_img(12, 12, seed=6)
    assert np.array_equal(decode_image(encode_gif(img)), img)


def test_sample_video_frames_real_gif_demux(spark):
    from frontera_spark.operators.multimodal import sample_video_frames
    from frontera_spark.sources.png import decode_png

    frames = [_palette_img(20, 20, levels=3, seed=s, step=90) for s in range(6)]
    gif = encode_gif(frames, delay_cs=2)
    still = __import__(
        "frontera_spark.sources.png", fromlist=["encode_png"]
    ).encode_png(frames[0])
    df = spark.createDataFrame(
        [("anim", bytearray(gif)), ("still", bytearray(still))],
        "image_id string, bytes binary",
    )
    rows = sample_video_frames(df, every_n=2, n_frames=6).collect()
    by_key = {(r["image_id"], r["frame_idx"]): r for r in rows}
    # animated: REAL frames 0, 2, 4 — pixel-exact vs the encoded frames
    for k in (0, 2, 4):
        got = decode_png(bytes(by_key[("anim", k)]["frame_bytes"]))
        assert np.array_equal(got, frames[k]), f"frame {k} mismatch"
    # still image: documented fallback (rolled copies), same op shape
    assert ("still", 0) in by_key and ("still", 2) in by_key
