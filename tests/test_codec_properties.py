"""Property-based round-trip invariants for the pure-numpy codecs
(sources/png.py, sources/jpeg.py, sources/gif.py, sources/wav.py).

Each property is the codec's contract stated once and hammered across
randomly drawn shapes/contents instead of a handful of fixtures:
- PNG: decode(encode(x)) == x for every uint8 RGB array (lossless).
- JPEG q100 4:4:4: PSNR(decode(encode(x)), x) >= 40 dB for EVERY input —
  the corpus's lossy-slice guarantee is a theorem, not a sample.
- GIF: decode(encode(x)) == x whenever x has <= 256 distinct colors.
- WAV 16-bit PCM: max reconstruction error <= 1.5 LSB (encode scales by
  32767, decode by 32768 — the standard asymmetric convention — so the
  worst case is (|x| + 0.5)/32768).
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from frontera_spark.sources.gif import decode_gif, encode_gif
from frontera_spark.sources.jpeg import decode_jpeg, encode_jpeg
from frontera_spark.sources.png import decode_png, encode_png, psnr
from frontera_spark.sources.wav import decode_wav, encode_wav

_dims = st.integers(min_value=1, max_value=40)


def _rgb(h: int, w: int, seed: int, levels: int = 256) -> np.ndarray:
    rng = np.random.default_rng(seed)
    px = rng.integers(0, levels, (h, w, 3)).astype(np.int64)
    return (px * (255 // max(1, levels - 1)) if levels < 256 else px).astype(np.uint8)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(h=_dims, w=_dims, seed=st.integers(0, 2**31 - 1))
def test_png_roundtrip_lossless(h, w, seed):
    px = _rgb(h, w, seed)
    assert np.array_equal(decode_png(encode_png(px)), px)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(h=_dims, w=_dims, seed=st.integers(0, 2**31 - 1))
def test_jpeg_q100_psnr_bar_holds_for_any_input(h, w, seed):
    px = _rgb(h, w, seed)
    out = decode_jpeg(encode_jpeg(px, quality=100))
    assert out.shape == px.shape
    p = psnr(out, px)
    assert p == float("inf") or p >= 40.0


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    h=_dims,
    w=_dims,
    seed=st.integers(0, 2**31 - 1),
    levels=st.integers(min_value=1, max_value=6),
    interlace=st.booleans(),
)
def test_gif_roundtrip_lossless_under_256_colors(h, w, seed, levels, interlace):
    px = _rgb(h, w, seed, levels=levels)  # <= 6^3 = 216 distinct colors
    assert np.array_equal(decode_gif(encode_gif(px, interlace=interlace)), px)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=1, max_value=4000),
    ch=st.integers(min_value=1, max_value=2),
    seed=st.integers(0, 2**31 - 1),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_within_one_lsb(n, ch, seed, rate):
    sig = np.random.default_rng(seed).uniform(-1, 1, (n, ch))
    out, r = decode_wav(encode_wav(sig, rate))
    assert r == rate and out.shape == (n, ch)
    assert np.abs(out - np.clip(sig, -1, 32767 / 32768)).max() <= 1.5 / 32768 + 1e-12
