"""Minimal pure-numpy RIFF/WAVE PCM encoder/decoder.

The container ships no audio library (SURVEY.md §7.3 M0), but uncompressed
WAV is a trivially public container (RIFF chunks + PCM samples), so the
audio feature path can be REAL for PCM payloads instead of the raw-byte
stand-in. Supports format 1 (integer PCM, 8/16/32-bit) and format 3
(IEEE float32), any channel count and sample rate; compressed formats
(MP3/AAC/…) raise NotImplementedError — no codec in this sandbox.

frontera parity note: frontera is payload-agnostic (SURVEY.md §0); this
exists for the graft's multimodal-column operators only.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float signal in [-1, 1] (n,) or (n, channels) -> 16-bit PCM WAV."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("expected (n,) or (n, channels) samples")
    n, ch = s.shape
    pcm = np.clip(np.rint(s * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 signal in [-1, 1] of shape (n, channels),
    sample_rate). PCM 8/16/32-bit and float32 only."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    audio_fmt = channels = sample_rate = bits = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
        elif tag == b"data":
            raw = body
    if audio_fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    if audio_fmt == 1:  # integer PCM
        if bits == 16:
            sig = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 8:  # 8-bit WAV is unsigned
            sig = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 32:
            sig = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"PCM bit depth {bits} not supported")
    elif audio_fmt == 3 and bits == 32:  # IEEE float
        sig = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV format tag {audio_fmt} (bits={bits}) has no codec in this "
            "container (compressed audio needs ffmpeg)"
        )
    n = (len(sig) // channels) * channels
    return sig[:n].reshape(-1, channels), sample_rate
