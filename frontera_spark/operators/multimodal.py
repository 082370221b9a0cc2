"""Multimodal column operators: image / audio / video payloads as opaque
``binary`` columns with typed metadata (builder-brief requirement; frontera
is payload-agnostic — SURVEY.md §0 — so these have no reference citation).

Design for 100 TB of media:
- payloads stay ``binary`` columns; every op is an Arrow-batched
  ``mapInPandas`` stage with a FIXED output DDL (schema drift is a pipeline
  outage at scale);
- ``bytes`` is selected only by the op that needs it and dropped from the
  output unless the op's product IS bytes (column pruning keeps payloads out
  of every other scan — same rule as the fetch stage);
- Arrow batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (session.py sets 2048) so a batch of 64 KB images stays ~128 MB.

Real vs stubbed: PNG decode, baseline JPEG decode (pure-numpy ITU-T T.81
codec — sources/jpeg.py), GIF decode + animated-GIF frame demux
(sources/gif.py), block-mean resize, perceptual hash, and RIFF/PCM WAV
audio decode (sources/wav.py) are REAL. WebP, MP4/WebM, and compressed
audio codecs need libraries this container does not ship (PIL/ffmpeg
absent — SURVEY.md §7.3 M0), so those decoders are STUBS: the Spark-side
plumbing (schemas, batch shapes, explode semantics, partitioning) is real
and tested against deterministic fakes, and each stub raises
``NotImplementedError`` for formats it cannot honestly fake.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_image(raw: bytes) -> np.ndarray:
    """bytes -> RGB uint8 (h, w, 3), dispatched on magic bytes (PNG
    signature / JPEG SOI), not on the metadata ``fmt`` column — a crawl
    cannot trust a Content-Type header. Raises NotImplementedError for
    container formats with no in-sandbox codec (WebP/GIF/...)."""
    from frontera_spark.sources.bmp import decode_bmp
    from frontera_spark.sources.gif import decode_gif
    from frontera_spark.sources.jpeg import decode_jpeg
    from frontera_spark.sources.png import decode_png

    if raw[:8] == _PNG_MAGIC:
        return decode_png(raw)
    if raw[:2] == b"\xff\xd8":
        return decode_jpeg(raw)
    if raw[:4] == b"GIF8":
        return decode_gif(raw)
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    raise NotImplementedError(
        "decode_image: no decoder for this payload in this container "
        "(PIL/libvips absent); png/qpng/jpeg/gif/bmp only"
    )

DECODE_STATS_SCHEMA = (
    "image_id string, w int, h int, fmt string, decoded_w int, decoded_h int, "
    "mean_luma double, channels int, decode_ok boolean"
)

DECODE_STATS_PHASH_SCHEMA = (
    DECODE_STATS_SCHEMA + ", phash_recomputed long, phash_match boolean"
)

RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"

PHASH_SCHEMA = "image_id string, phash long, phash_recomputed long, phash_match boolean"

FRAME_SCHEMA = "image_id string, frame_idx int, frame_bytes binary, w int, h int"

AUDIO_FEATURES_SCHEMA = (
    "image_id string, n_bytes int, rms double, zero_crossings long, "
    "spectral_centroid double"
)


def decode_images(df: DataFrame, recompute_phash: bool = False) -> DataFrame:
    """bytes → decoded-pixel stats (REAL for png/qpng/jpeg/gif/bmp; other
    fmts raise).

    The per-row invariant pipeline's building block: decoded dimensions must
    match the metadata columns, mean luminance is the cheap content
    fingerprint downstream quality filters use. With ``recompute_phash``,
    the 64-bit perceptual hash is computed from the SAME decoded pixels and
    compared to the stored ``phash`` column — one decode pass serves both
    stats and content-identity (a 100 TB corpus cannot afford decoding
    every payload twice)."""
    known = ("png", "qpng", "jpeg", "gif", "bmp")
    cols = ["image_id", "bytes", "w", "h", "fmt"] + (
        ["phash"] if recompute_phash else []
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from frontera_spark.sources.corpus import phash_of

        for pdf in batches:
            rows = []
            stored_ph = pdf["phash"] if recompute_phash else pdf["image_id"]
            for iid, raw, w, h, fmt, stored in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], stored_ph
            ):
                if fmt not in known:
                    raise NotImplementedError(
                        f"decode_images: no decoder for fmt={fmt!r} in this "
                        f"container (PIL/libvips absent); {'/'.join(known)} only"
                    )
                try:
                    px = decode_image(bytes(raw))
                    luma = float(px.astype(np.float64).mean())
                    row = [iid, w, h, fmt, px.shape[1], px.shape[0], luma, px.shape[2], True]
                    if recompute_phash:
                        ph = phash_of(px)
                        row += [ph, ph == int(stored)]
                except Exception:
                    row = [iid, w, h, fmt, None, None, None, None, False]
                    if recompute_phash:
                        row += [None, None]
                rows.append(tuple(row))
            names = [
                "image_id", "w", "h", "fmt", "decoded_w", "decoded_h",
                "mean_luma", "channels", "decode_ok",
            ]
            if recompute_phash:
                names += ["phash_recomputed", "phash_match"]
            yield pd.DataFrame(rows, columns=names)

    return df.select(*cols).mapInPandas(
        fn, DECODE_STATS_PHASH_SCHEMA if recompute_phash else DECODE_STATS_SCHEMA
    )


def resize_images(
    df: DataFrame,
    out_w: int = 16,
    out_h: int = 16,
    out_fmt: str = "png",
    jpeg_quality: int = 85,
) -> DataFrame:
    """Block-mean resize to (out_w, out_h), re-encoded as PNG or baseline
    JPEG (REAL both ways — the thumbnail pipeline a training-data prep run
    would use; JPEG thumbnails are typically several times smaller)."""
    if out_fmt not in ("png", "jpeg"):
        raise ValueError("out_fmt must be 'png' or 'jpeg'")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from frontera_spark.sources.jpeg import encode_jpeg
        from frontera_spark.sources.png import encode_png

        for pdf in batches:
            rows = []
            for iid, raw in zip(pdf["image_id"], pdf["bytes"]):
                px = decode_image(bytes(raw))
                h, w = px.shape[:2]
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                small = px[np.ix_(yi, xi)]
                payload = (
                    encode_jpeg(small, quality=jpeg_quality)
                    if out_fmt == "jpeg"
                    else encode_png(small)
                )
                rows.append((iid, payload, out_w, out_h, out_fmt))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return df.select("image_id", "bytes").mapInPandas(fn, RESIZE_SCHEMA)


def compute_phash(df: DataFrame) -> DataFrame:
    """Recompute the 64-bit perceptual hash from bytes and compare with the
    stored ``phash`` column (REAL — the image-near-dup key;
    operators/driver_queries.q_phash_neardup_pairs is the join that consumes
    it at scale)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from frontera_spark.sources.corpus import phash_of

        for pdf in batches:
            rows = []
            for iid, raw, stored in zip(pdf["image_id"], pdf["bytes"], pdf["phash"]):
                ph = phash_of(decode_image(bytes(raw)))
                rows.append((iid, stored, ph, int(stored) == ph))
            yield pd.DataFrame(
                rows, columns=["image_id", "phash", "phash_recomputed", "phash_match"]
            )

    return df.select("image_id", "bytes", "phash").mapInPandas(fn, PHASH_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 2, n_frames: int = 6) -> DataFrame:
    """Frame sampling: one input row → one output row per sampled frame.

    REAL demux for animated GIF payloads (sources/gif.py): the actual
    frames are decoded, every ``every_n``-th is kept up to ``n_frames``,
    and each is re-encoded PNG. Still-image payloads keep the documented
    deterministic fake (frame k = image rolled k rows) so the op shape is
    exercised on every corpus; MP4/WebM demuxing needs ffmpeg, which this
    container does not ship. Everything Spark-side is the real design: an
    explode-in-pandas 1→N mapInPandas (NOT a driver loop), fixed frame DDL,
    payload-only column selection."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from frontera_spark.sources.gif import decode_gif_frames
        from frontera_spark.sources.png import encode_png

        for pdf in batches:
            rows = []
            for iid, raw in zip(pdf["image_id"], pdf["bytes"]):
                raw = bytes(raw)
                if raw[:4] == b"GIF8":
                    frames = decode_gif_frames(raw)
                    for k in range(0, min(len(frames), n_frames), every_n):
                        f = frames[k]
                        rows.append((iid, k, encode_png(f), f.shape[1], f.shape[0]))
                    continue
                px = decode_image(raw)
                for k in range(0, n_frames, every_n):
                    frame = np.roll(px, shift=k, axis=0)
                    rows.append(
                        (iid, k, encode_png(frame), frame.shape[1], frame.shape[0])
                    )
            yield pd.DataFrame(
                rows, columns=["image_id", "frame_idx", "frame_bytes", "w", "h"]
            )

    return df.select("image_id", "bytes").mapInPandas(fn, FRAME_SCHEMA)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Audio features: REAL for RIFF/PCM WAV payloads (sources/wav.py),
    byte-view fallback for everything else.

    Payloads starting with the RIFF/WAVE magic are decoded to their actual
    PCM signal (averaged to mono); other payloads are treated as a raw
    8-bit mono signal — deterministic, and the feature set (RMS,
    zero-crossing count, spectral centroid via rFFT) is the standard one
    either way. Compressed audio (MP3/AAC) still needs ffmpeg — absent in
    this container — and flows through the byte-view fallback."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from frontera_spark.sources.wav import decode_wav

        for pdf in batches:
            rows = []
            for iid, raw in zip(pdf["image_id"], pdf["bytes"]):
                raw = bytes(raw)
                if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                    sig = decode_wav(raw)[0].mean(axis=1)
                else:
                    sig = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                    sig = (sig - 128.0) / 128.0
                rms = float(np.sqrt((sig**2).mean())) if len(sig) else 0.0
                zc = int(((sig[:-1] * sig[1:]) < 0).sum()) if len(sig) > 1 else 0
                spec = np.abs(np.fft.rfft(sig))
                tot = float(spec.sum())
                cent = float((spec * np.arange(len(spec))).sum() / tot) if tot > 0 else 0.0
                rows.append((iid, len(raw), rms, zc, cent))
            yield pd.DataFrame(
                rows,
                columns=["image_id", "n_bytes", "rms", "zero_crossings", "spectral_centroid"],
            )

    return df.select("image_id", "bytes").mapInPandas(fn, AUDIO_FEATURES_SCHEMA)
