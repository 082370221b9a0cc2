"""Corpus generator + PNG codec tests (FIXTURES.md §1, SURVEY.md M0).

Pins: determinism, schema, PNG round-trip, lossless bit-exactness, lossy
PSNR >= 40 dB, phash stability, skew fixture (hot host ~30%).
"""

import numpy as np
import pytest

from frontera_spark.sources.corpus import (
    fmt_of,
    generate_corpus,
    host_of,
    make_row,
    out_links_of,
    phash_of,
    raw_pixels,
    stored_pixels,
    url_of,
)
from frontera_spark.sources.png import decode_png, encode_png, psnr


def test_png_roundtrip():
    rng = np.random.default_rng(7)
    for shape in [(32, 32, 3), (48, 64, 3), (1, 1, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_row_determinism():
    a = make_row(17, seed=42, n_images=1000, n_hosts=7)
    b = make_row(17, seed=42, n_images=1000, n_hosts=7)
    assert a == b
    c = make_row(17, seed=43, n_images=1000, n_hosts=7)
    assert c["bytes"] != a["bytes"]


def test_lossless_exact_and_lossy_psnr():
    n = 200
    saw_lossy = saw_lossless = False
    for idx in range(n):
        ref = raw_pixels(42, idx)
        dec = decode_png(make_row(idx, 42, n, 7)["bytes"])
        if fmt_of(idx) == "png":
            assert np.array_equal(dec, ref)
            saw_lossless = True
        else:
            p = psnr(dec, ref)
            assert p >= 40.0, (idx, p)
            saw_lossy = True
    assert saw_lossy and saw_lossless


def test_phash_properties():
    px = stored_pixels(42, 3)
    h1 = phash_of(px)
    assert h1 == phash_of(px.copy())
    assert -(2**63) <= h1 < 2**63
    h2 = phash_of(stored_pixels(42, 4))
    assert h1 != h2


def test_graph_shape():
    links = out_links_of(0, 1000, 7)
    assert links == [url_of(1, 7), url_of(2, 7)]
    links7 = out_links_of(7, 1000, 7)
    assert url_of(3, 7) in links7  # back-edge 7//2
    assert out_links_of(999, 1000, 7) == []  # leaf


def test_hot_host_skew():
    n = 2000
    hot = sum(1 for i in range(n) if host_of(i, 31) == 0)
    assert 0.25 * n < hot < 0.37 * n  # ~30% + crc32-bucket noise


def test_spark_generation(spark):
    df = generate_corpus(spark, n_images=100, n_hosts=7, seed=42, partitions=4)
    assert df.count() == 100
    assert set(df.columns) == {
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "url", "out_links",
    }
    rows = {r.image_id: r for r in df.collect()}
    ref = make_row(42, 42, 100, 7)
    got = rows["img00000042"]
    assert bytes(got.bytes) == ref["bytes"]
    assert got.caption == ref["caption"]
    assert got.phash == ref["phash"]
    assert got.url == ref["url"]
    assert list(got.out_links) == ref["out_links"]
