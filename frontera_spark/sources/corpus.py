"""Deterministic image+caption corpus generator (the crawled "web").

Produces the BASELINE input_hint table — ``image_id:string, bytes:binary,
w:int, h:int, fmt:string, caption:string, phash:int64`` — plus the derived
crawl-graph columns ``url`` and ``out_links`` (FIXTURES.md §1). Everything is
a pure function of (seed, idx): the fetch-stage invariant checker regenerates
the reference pixels from the same function, no golden files needed.

Generation is DISTRIBUTED: ``spark.range(n)`` → ``mapInPandas`` — each task
synthesizes its own id-range, so corpus size scales with the cluster, not the
driver (the 10^10-design-point analogue of frontera's graph fixtures,
frontera/utils/graphs/data.py).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CORPUS_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, url string, out_links array<string>"
)

_SIZES = (32, 48, 64)
_NOUNS = (
    "a red fox", "an old bridge", "a paper lantern", "two sailboats", "a snowy ridge",
    "a brass clock", "a tide pool", "a stone arch", "a wheat field", "a neon sign",
    "a rope swing", "an ice cave", "a clay teapot", "a lighthouse", "a mossy log",
)
_VERBS = (
    "resting", "glowing", "drifting", "standing", "reflected", "half-hidden",
    "swaying", "weathered", "captured at dusk", "seen from above",
)
_HOT_HOST_SHARE = 0.3  # one designated hot host gets 30% of URLs (skew fixture)


def image_id_of(idx: int) -> str:
    return f"img{idx:08d}"


def _rng(seed: int, idx: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, idx]))


def raw_pixels(seed: int, idx: int) -> np.ndarray:
    """Pre-quantization reference pixels for image idx (the PSNR baseline)."""
    w, h = size_of(idx)
    return _rng(seed, idx).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def size_of(idx: int) -> tuple[int, int]:
    z = zlib.crc32(image_id_of(idx).encode())
    return _SIZES[z % 3], _SIZES[(z >> 8) % 3]


def fmt_of(idx: int, jpeg_share: float = 0.0) -> str:
    """80% lossless 'png' (bit-exact invariant), 20% 'qpng' (quantize-then-PNG,
    lossy, PSNR >= 40 dB by construction: max error 1/channel). With
    jpeg_share > 0, that fraction of rows (selected by an independent crc32
    bucket, so the slice is stable as the share moves) is stored as REAL
    baseline JPEG at quality 100 (sources/jpeg.py) — the genuinely lossy
    codec path of the input_hint's "PSNR>=40dB for lossy" invariant.
    Default 0.0 keeps every pre-round-5 fixture byte-identical."""
    if jpeg_share > 0 and zlib.crc32(f"jpg{image_id_of(idx)}".encode()) % 100 < jpeg_share * 100:
        return "jpeg"
    return "qpng" if zlib.crc32(image_id_of(idx).encode()) % 10 >= 8 else "png"


def stored_pixels(seed: int, idx: int, jpeg_share: float = 0.0) -> np.ndarray:
    """Pixels the stored payload decodes to — EXCEPT for 'jpeg' rows, where
    the return is the pre-compression reference (DCT rounding makes the
    decoded pixels non-bit-exact; the invariant is PSNR, not equality)."""
    px = raw_pixels(seed, idx)
    if fmt_of(idx, jpeg_share) == "qpng":
        px = ((px.astype(np.int16) // 2) * 2).astype(np.uint8)  # quantize step 2
    return px


def caption_of(idx: int) -> str:
    z = zlib.crc32(f"cap{idx}".encode())
    return (
        f"a photo of {_NOUNS[z % len(_NOUNS)]} {_VERBS[(z >> 6) % len(_VERBS)]} "
        f"near {_NOUNS[(z >> 12) % len(_NOUNS)]}"
    )


def phash_of(pixels: np.ndarray) -> int:
    """64-bit perceptual-style hash: grayscale → 32x32 block-mean resize →
    2D DCT-II → top-left 8x8 AC coefficients → sign-vs-median bits."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # block-mean resize to 32x32 via index binning (works for any h,w)
    yi = (np.arange(32) * h) // 32
    xi = (np.arange(32) * w) // 32
    small = gray[np.ix_(yi, xi)]
    n = 32
    k = np.arange(n)
    dct_m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    dct_m[0, :] = np.sqrt(1.0 / n)
    coeffs = dct_m @ small @ dct_m.T
    block = coeffs[:8, :8].flatten()
    med = np.median(block[1:])  # exclude DC from the median
    bits = (block > med).astype(np.uint64)
    v = np.uint64(0)
    for b in bits:
        v = (v << np.uint64(1)) | b
    iv = int(v)
    return iv - 0x1_0000_0000_0000_0000 if iv >= 0x8000_0000_0000_0000 else iv


def host_of(idx: int, n_hosts: int) -> int:
    """crc32(image_id) % n_hosts, except a 30% slice pinned to hot host 0."""
    if zlib.crc32(f"hot{image_id_of(idx)}".encode()) % 100 < _HOT_HOST_SHARE * 100:
        return 0
    return zlib.crc32(image_id_of(idx).encode()) % n_hosts


def url_of(idx: int, n_hosts: int) -> str:
    return f"https://h{host_of(idx, n_hosts):03d}.example.test/i/{image_id_of(idx)}"


def out_links_of(
    idx: int, n_images: int, n_hosts: int, alias_share: float = 0.0
) -> list[str]:
    """Binary tree children {2i+1, 2i+2} + every-7th back-edge (cycle).

    With ``alias_share`` > 0, that fraction of child links (stable crc32
    slice) is emitted as a session-tracking ALIAS — ``url?sess=<parent%3>``
    — the DUST fixture (core/dust.py): distinct URL strings the server
    resolves to the same page (``fetch_stage(server_ignores=('sess',))``).
    Default 0.0 keeps every pre-existing fixture byte-identical."""
    links = []
    for c in (2 * idx + 1, 2 * idx + 2):
        if c >= n_images:
            continue
        u = url_of(c, n_hosts)
        if alias_share > 0 and zlib.crc32(f"al{idx}:{c}".encode()) % 100 < alias_share * 100:
            u += f"?sess={idx % 3}"
        links.append(u)
    if idx % 7 == 0 and idx > 0:
        links.append(url_of(idx // 2, n_hosts))  # back-edge to a smaller idx
    return links


def make_row(
    idx: int,
    seed: int,
    n_images: int,
    n_hosts: int,
    jpeg_share: float = 0.0,
    alias_share: float = 0.0,
) -> dict:
    from frontera_spark.sources.jpeg import encode_jpeg
    from frontera_spark.sources.png import encode_png

    fmt = fmt_of(idx, jpeg_share)
    px = stored_pixels(seed, idx, jpeg_share)
    if fmt == "jpeg":
        # q100 4:4:4: quant tables are all-ones, so the only loss is DCT
        # rounding — PSNR >= 40 dB holds even on noise pixels (measured ~53)
        payload = encode_jpeg(px, quality=100)
    else:
        payload = encode_png(px)
    return {
        "image_id": image_id_of(idx),
        "bytes": payload,
        "w": px.shape[1],
        "h": px.shape[0],
        "fmt": fmt,
        "caption": caption_of(idx),
        "phash": phash_of(px),
        "url": url_of(idx, n_hosts),
        "out_links": out_links_of(idx, n_images, n_hosts, alias_share),
    }


def generate_corpus(
    spark: SparkSession,
    n_images: int,
    n_hosts: int = 31,
    seed: int = 42,
    partitions: int | None = None,
    jpeg_share: float = 0.0,
    alias_share: float = 0.0,
) -> DataFrame:
    """Distributed corpus DataFrame; pure function of (seed, idx) per row."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                make_row(int(i), seed, n_images, n_hosts, jpeg_share, alias_share)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    return spark.range(0, n_images, 1, parts).mapInPandas(gen, CORPUS_SCHEMA)


def write_corpus(
    spark: SparkSession,
    path: str,
    n_images: int,
    n_hosts: int = 31,
    seed: int = 42,
    jpeg_share: float = 0.0,
    alias_share: float = 0.0,
) -> None:
    generate_corpus(
        spark, n_images, n_hosts, seed, jpeg_share=jpeg_share, alias_share=alias_share
    ).write.mode("overwrite").parquet(path)
