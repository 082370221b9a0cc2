"""Pure-Python GIF87a/89a encoder/decoder (LZW, palette, animation).

Third real in-sandbox image codec beside PNG (sources/png.py) and baseline
JPEG (sources/jpeg.py) — GIF is the one genuinely multi-frame container a
crawler sees that needs no external library, so the video-style frame
demux path (operators/multimodal.sample_video_frames) can be REAL for
animated GIFs instead of a deterministic fake. Public spec only (GIF89a
specification + LZW as defined there).

Supported:
- decode: global/local color tables, interlace, multiple frames with
  left/top offsets, graphic-control transparency (transparent pixels keep
  the previous canvas — standard composition), disposal methods 0/1 (leave)
  and 2 (restore background); frames are returned as full-canvas RGB
  snapshots. Deferred clear codes handled.
- encode: one or more same-size RGB frames; exact palette when the frames
  hold <= 256 distinct colors, else 6-6-6 uniform quantization (lossy,
  documented); optional interlace and per-frame delay + NETSCAPE loop
  extension for animations.

Encoder/decoder width-change alignment follows the spec's "first code is
one wider than the minimum, widen when the next assignment would not fit"
rule; decode is additionally pinned against a well-known external 1x1 GIF
byte string in tests (not just our own round-trip).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096  # 12-bit LZW ceiling (GIF spec)


# ------------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    """Concatenated sub-block payload -> index array of length n_pixels."""
    clear = 1 << min_code
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader: GIF packs codes LSB-first
    acc = 0
    nbits = 0
    pos = 0

    def read(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return -1  # truncated stream: treat as implicit EOI
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    # dict as flat arrays: prefix link + last byte (faster than bytes concat)
    prefix = np.full(_MAX_CODE, -1, dtype=np.int32)
    suffix = np.zeros(_MAX_CODE, dtype=np.uint8)
    for i in range(clear):
        suffix[i] = i
    next_code = eoi + 1
    width = min_code + 1
    prev = -1
    stack = bytearray()

    while n_out < n_pixels:
        code = read(width)
        if code < 0 or code == eoi:
            break
        if code == clear:
            next_code = eoi + 1
            width = min_code + 1
            prev = -1
            continue
        if code >= next_code and not (code == next_code and prev >= 0):
            raise ValueError("corrupt LZW stream: code out of range")
        # expand code (or the prev+first special case) onto a stack
        stack.clear()
        c = prev if code == next_code else code
        while c >= clear:  # walk prefix links down to a root
            stack.append(suffix[c])
            c = prefix[c]
        stack.append(suffix[c])
        first = stack[-1]
        if code == next_code:
            stack.insert(0, first)
        take = min(len(stack), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(bytes(stack[::-1]), dtype=np.uint8)[:take]
        n_out += take
        if prev >= 0 and next_code < _MAX_CODE:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out < n_pixels:
        raise ValueError("truncated GIF image data")
    return out


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    emit(clear, width)
    w = b""
    for k in indices.tobytes():
        kb = bytes([k])
        wk = w + kb
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code += 1
            # encoder widens one assignment later than the decoder reads —
            # the decoder is one entry behind when it consumes this code
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: reset (decoder mirrors on the clear code)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        w = kb
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    chunks = bytearray()
    for i in range(0, len(payload), 255):
        part = payload[i : i + 255]
        chunks.append(len(part))
        chunks += part
    chunks.append(0)
    return bytes(chunks)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate([np.arange(start, h, step) for start, step in _INTERLACE_PASSES])


# ---------------------------------------------------------------- encode


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    delay_cs: int = 4,
    loop: int = 0,
    interlace: bool = False,
) -> bytes:
    """RGB uint8 frame(s), all (h, w, 3) and same size -> GIF bytes.

    Lossless when the frames use <= 256 distinct colors; otherwise pixels
    are quantized to the 6-6-6 uniform cube (216 colors) first."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.dtype != np.uint8 or f.ndim != 3 or f.shape != (h, w, 3):
            raise ValueError("frames must all be uint8 (h, w, 3) of one size")
    stack = np.stack(frames)  # (n, h, w, 3)
    packed = (
        stack[..., 0].astype(np.int32) << 16
        | stack[..., 1].astype(np.int32) << 8
        | stack[..., 2].astype(np.int32)
    )
    colors = np.unique(packed)
    if len(colors) > 256:
        stack = ((stack.astype(np.int32) // 51) * 51).astype(np.uint8)
        packed = (
            stack[..., 0].astype(np.int32) << 16
            | stack[..., 1].astype(np.int32) << 8
            | stack[..., 2].astype(np.int32)
        )
        colors = np.unique(packed)
    colors, inverse = np.unique(packed, return_inverse=True)
    indices = inverse.reshape(packed.shape).astype(np.uint8)
    # color table size: 2^(n+1) >= len(colors), n in 0..7
    n_bits = max(1, int(len(colors) - 1).bit_length())
    table_len = 1 << n_bits
    palette = np.zeros((table_len, 3), dtype=np.uint8)
    palette[: len(colors), 0] = (colors >> 16) & 0xFF
    palette[: len(colors), 1] = (colors >> 8) & 0xFF
    palette[: len(colors), 2] = colors & 0xFF

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (7 << 4) | (n_bits - 1))  # GCT present, 8-bit res
    out += b"\x00\x00"  # bg index 0, no aspect
    out += palette.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0" + _sub_blocks(struct.pack("<BH", 1, loop))[:-1]
        out.append(0)
    min_code = max(2, n_bits)
    for fi in range(len(frames)):
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out.append(0x2C)
        out += struct.pack("<HHHH", 0, 0, w, h)
        out.append(0x40 if interlace else 0x00)  # no LCT
        idx = indices[fi]
        if interlace:
            idx = idx[_interlace_order(h)]
        out.append(min_code)
        out += _sub_blocks(_lzw_encode(idx.reshape(-1), min_code))
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------- decode


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of full-canvas RGB uint8 (h, w, 3) frames."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", data, 6)
    if w == 0 or h == 0:
        raise ValueError("zero canvas dimension")
    packed, bg, _aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                flags, _delay, tidx = struct.unpack_from("<BHB", data, pos + 1)
                transparent = tidx if flags & 1 else -1
                disposal = (flags >> 2) & 0x07
                pos += 1 + size
                if data[pos] != 0:
                    raise ValueError("malformed graphic control block")
                pos += 1
            else:  # skip sub-block chain (comment/app/plain-text)
                while True:
                    n = data[pos]
                    pos += 1
                    if n == 0:
                        break
                    pos += n
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, iw, ih = struct.unpack_from("<HHHH", data, pos)
        pos += 8
        iflags = data[pos]
        pos += 1
        if left + iw > w or top + ih > h or iw == 0 or ih == 0:
            raise ValueError("image block outside canvas")
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("no color table for image block")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad LZW minimum code size {min_code}")
        payload = bytearray()
        while True:
            n = data[pos]
            pos += 1
            if n == 0:
                break
            payload += data[pos : pos + n]
            pos += n
        idx = _lzw_decode(bytes(payload), min_code, iw * ih).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
            deinter = np.empty_like(idx)
            deinter[_interlace_order(ih)] = idx
            idx = deinter
        if idx.max() >= len(lct):
            raise ValueError("palette index out of range")
        region = canvas[top : top + ih, left : left + iw]
        rgb = lct[idx]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore background in the frame's region
            canvas[top : top + ih, left : left + iw] = bg_rgb
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> first frame as RGB uint8 (h, w, 3)."""
    return decode_gif_frames(data)[0]
