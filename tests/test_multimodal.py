"""Multimodal column operators over the image+caption corpus: real PNG
decode/resize/phash, stubbed-but-plumbing-real video/audio ops."""

import pytest
from pyspark.sql import functions as F

from frontera_spark.operators.multimodal import (
    compute_phash,
    decode_images,
    extract_audio_features,
    resize_images,
    sample_video_frames,
)
from frontera_spark.sources.corpus import write_corpus

N_IMAGES, N_HOSTS, SEED = 24, 5, 42


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mm_corpus") / "corpus")
    write_corpus(spark, path, N_IMAGES, N_HOSTS, SEED)
    return spark.read.parquet(path)


def test_decode_stats_match_metadata(corpus):
    out = decode_images(corpus)
    rows = out.collect()
    assert len(rows) == N_IMAGES
    assert all(r.decode_ok for r in rows)
    assert all(r.decoded_w == r.w and r.decoded_h == r.h for r in rows)
    assert all(r.channels == 3 for r in rows)
    assert all(0.0 <= r.mean_luma <= 255.0 for r in rows)


def test_resize_roundtrip(spark, corpus):
    out = resize_images(corpus, 16, 16)
    # resized payloads decode to exactly 16x16
    stats = decode_images(out).collect()
    assert len(stats) == N_IMAGES
    assert all(r.decoded_w == 16 and r.decoded_h == 16 for r in stats)


def test_phash_recompute_matches_stored(corpus):
    out = compute_phash(corpus)
    rows = out.collect()
    assert len(rows) == N_IMAGES
    # lossless rows must match exactly; quantized (qpng) rows were hashed
    # AFTER quantization at corpus build, so they match too
    assert all(r.phash_match for r in rows)


def test_video_frame_sampling_shape(corpus):
    out = sample_video_frames(corpus, every_n=2, n_frames=6)
    assert out.count() == N_IMAGES * 3  # frames 0, 2, 4
    per = out.groupBy("image_id").count().collect()
    assert all(r["count"] == 3 for r in per)
    # frames decode at the source dimensions
    one = out.filter(F.col("frame_idx") == 2).limit(1).collect()[0]
    from frontera_spark.sources.png import decode_png

    px = decode_png(bytes(one.frame_bytes))
    assert (px.shape[1], px.shape[0]) == (one.w, one.h)


def test_audio_features_deterministic(corpus):
    a = {r.image_id: (r.rms, r.zero_crossings, r.spectral_centroid)
         for r in extract_audio_features(corpus).collect()}
    b = {r.image_id: (r.rms, r.zero_crossings, r.spectral_centroid)
         for r in extract_audio_features(corpus).collect()}
    assert a == b and len(a) == N_IMAGES
    assert all(v[0] > 0 for v in a.values())


def test_unknown_format_raises(spark):
    # 'webp' has no in-sandbox codec: the fmt guard must raise loudly
    # (jpeg moved OFF this list in round 5 — sources/jpeg.py is real now)
    df = spark.createDataFrame(
        [("x", bytearray(b"notwebp"), 4, 4, "webp")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        decode_images(df).collect()


def test_decode_images_fused_phash_single_pass(spark, corpus):
    # recompute_phash=True must equal the standalone compute_phash output
    # while decoding each payload exactly once (one mapInPandas, no join)
    from frontera_spark.operators.multimodal import compute_phash

    fused = {r["image_id"]: r for r in decode_images(corpus, recompute_phash=True).collect()}
    standalone = {r["image_id"]: r for r in compute_phash(corpus).collect()}
    assert set(fused) == set(standalone)
    for iid, r in standalone.items():
        assert fused[iid]["phash_recomputed"] == r["phash_recomputed"]
        assert fused[iid]["phash_match"] == r["phash_match"]
        assert fused[iid]["decode_ok"] is True
    plan = decode_images(corpus, recompute_phash=True)._jdf.queryExecution().toString()
    assert "Join" not in plan


def test_corrupt_bytes_supported_format_flags_not_raises(spark):
    # a supported fmt with undecodable bytes is a per-row decode_ok=False,
    # not a stage failure — one bad payload must not kill a 100 TB scan
    df = spark.createDataFrame(
        [("x", bytearray(b"\xff\xd8garbage"), 4, 4, "jpeg")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = decode_images(df).collect()
    assert len(rows) == 1 and rows[0]["decode_ok"] is False
