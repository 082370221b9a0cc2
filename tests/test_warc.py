"""WARC 1.0 archival sink + reader (sources/warc.py — ISO 28500 framing,
per-record gzip members as in Common Crawl's .warc.gz layout). Round-trip
fidelity, spec framing pinned byte-level, multi-member gzip readable by the
stock gzip module, and replay determinism (same crawl → same archive
bytes)."""

import gzip

import pytest
from pyspark.sql import functions as F

from frontera_spark.sources.warc import (
    WARC_TEST_DATE,
    fetch_record,
    parse_warc_bytes,
    read_cdx,
    read_warc,
    surt_key,
    warc_record,
    write_warc,
)


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        ("https://a.example.test/p1", b"\x89PNG payload one", "image/png"),
        ("https://a.example.test/p2", b"", "image/png"),  # empty block is legal
        ("https://b.example.test/x?q=1&r=2", b"bytes \r\n with CRLF inside", "text/plain"),
        ("https://c.example.test/big", bytes(range(256)) * 40, "application/octet-stream"),
    ]
    return spark.createDataFrame(rows, "url string, payload binary, ctype string")


def _records_df(pages):
    return pages.select(
        "url",
        "payload",
        warc_record(
            F.col("url"), F.col("payload"), F.col("ctype"), F.lit(WARC_TEST_DATE)
        ).alias("record"),
    )


def test_record_framing_matches_spec(spark, pages):
    rows = _records_df(pages).collect()
    for r in rows:
        raw = bytes(r.record)
        recs = parse_warc_bytes(raw)
        assert len(recs) == 1
        rec = recs[0]
        assert rec["warc_type"] == "response"
        assert rec["target_uri"] == r.url
        assert rec["warc_date"] == WARC_TEST_DATE
        assert rec["content_length"] == len(bytes(r.payload))
        assert rec["payload"] == bytes(r.payload)
        # header terminates with a blank line, record with CRLF CRLF
        assert b"\r\n\r\n" in raw and raw.endswith(b"\r\n\r\n")
        assert raw.startswith(b"WARC/1.0\r\n")
        # deterministic id: md5 of the target URI
        import hashlib

        assert rec["record_id"] == f"<urn:md5:{hashlib.md5(r.url.encode()).hexdigest()}>"


def test_payload_with_embedded_crlf_survives(spark, pages):
    """Content-Length framing (not delimiter scanning) must carry blocks
    containing CRLF CRLF — the reason WARC uses counted blocks."""
    df = _records_df(pages.filter(F.col("url").contains("b.example")))
    raw = bytes(df.collect()[0].record)
    rec = parse_warc_bytes(raw)[0]
    assert rec["payload"] == b"bytes \r\n with CRLF inside"


@pytest.mark.parametrize("compress", [True, False])
def test_write_read_round_trip(spark, tmp_path, pages, compress):
    recs = _records_df(pages).repartition(2, "url")
    out = str(tmp_path / ("gz" if compress else "plain"))
    manifest = write_warc(recs, out, compress=compress)
    assert manifest["n_records"].sum() == pages.count()
    assert len(manifest) == 2  # one part file per partition

    back = read_warc(spark, out)
    info = back.filter(F.col("warc_type") == "warcinfo").collect()
    assert len(info) == 2  # every part opens with a warcinfo record
    got = {
        r.target_uri: bytes(r.payload)
        for r in back.filter(F.col("warc_type") == "response").collect()
    }
    exp = {r.url: bytes(r.payload) for r in pages.collect()}
    assert got == exp


def test_gzip_members_standard_readable(spark, tmp_path, pages):
    """Per-record gzip members concatenate into a stream any stock gzip
    reader inflates whole — the Common Crawl compatibility property."""
    out = str(tmp_path / "gzstd")
    manifest = write_warc(_records_df(pages).coalesce(1), out)
    raw = gzip.decompress(open(manifest["file"][0], "rb").read())
    recs = parse_warc_bytes(raw)
    assert [r["warc_type"] for r in recs][0] == "warcinfo"
    assert sorted(r["target_uri"] for r in recs if r["warc_type"] == "response") == sorted(
        r.url for r in pages.collect()
    )


def test_archive_bytes_deterministic(spark, tmp_path, pages):
    """Same content → byte-identical archive (mtime=0 gzip members,
    md5-derived ids, pinned date): the replay/resume contract."""
    recs = _records_df(pages).repartition(2, "url")
    m1 = write_warc(recs, str(tmp_path / "a"))
    m2 = write_warc(recs, str(tmp_path / "b"))
    for f1, f2 in zip(m1["file"], m2["file"]):
        assert open(f1, "rb").read() == open(f2, "rb").read()


def test_surt_key_transform():
    assert surt_key("https://img.Example.test:8443/P?q=1") == "test,example,img)/p?q=1"
    assert surt_key("http://a.b.c/") == "c,b,a)/"
    assert surt_key("https://x.test") == "test,x)/"


def test_cdx_index_random_access(spark, tmp_path, pages):
    """CDXJ sidecars (index=True): every response record is indexed with
    its member offset/length; fetch_record seeks + inflates exactly one
    member and returns the identical payload a full scan sees — the
    point-lookup path into a large archive."""
    out = str(tmp_path / "idx")
    write_warc(_records_df(pages).repartition(2, "url"), out, index=True)

    idx = read_cdx(spark, out)
    rows = idx.collect()
    assert len(rows) == pages.count()  # warcinfo records are not indexed
    exp = {r.url: bytes(r.payload) for r in pages.collect()}
    import hashlib

    for r in rows:
        assert r.surt == surt_key(r.url)
        assert r.timestamp == "20260101000000"
        rec = fetch_record(out, r.filename, r.offset, r.length)
        assert rec["warc_type"] == "response"
        assert rec["target_uri"] == r.url
        assert rec["payload"] == exp[r.url]
        assert r.digest == "sha1:" + hashlib.sha1(exp[r.url]).hexdigest()
    # sidecar lines are sorted by SURT key within each part
    import glob

    for f in glob.glob(out + "/part-*.cdxj"):
        keys = [ln.split(" ", 1)[0] for ln in open(f).read().splitlines() if ln]
        assert keys == sorted(keys)


def test_cdx_lookup_join_locates_urls(spark, tmp_path, pages):
    """Distributed lookup: join a URL batch against the index frame, fetch
    only the hits (how a 100 TB archive serves point reads)."""
    out = str(tmp_path / "lkp")
    write_warc(_records_df(pages).repartition(2, "url"), out, index=True)
    want = [r.url for r in pages.limit(2).collect()]
    idx = read_cdx(spark, out)
    batch = spark.createDataFrame([(u,) for u in want], "url string")
    hits = idx.join(F.broadcast(batch), "url").collect()
    assert sorted(h.url for h in hits) == sorted(want)
    exp = {r.url: bytes(r.payload) for r in pages.collect()}
    for h in hits:
        assert fetch_record(out, h.filename, h.offset, h.length)["payload"] == exp[h.url]


def test_archive_crawled_job_covers_crawled_set(spark, tmp_path):
    """jobs/warc_archive.archive_crawled: a finished crawl's CRAWLED rows —
    exactly those — land in the archive with their corpus payload bytes."""
    from jobs.warc_archive import archive_crawled

    from frontera_spark import STATE_CRAWLED
    from frontera_spark.sources.corpus import url_of, write_corpus
    from frontera_spark.streaming.loop import CrawlLoop

    cpath = str(tmp_path / "corpus")
    write_corpus(spark, cpath, 30, 5, 13)
    loop = CrawlLoop(
        spark, str(tmp_path / "crawl"), cpath, corpus_seed=13,
        batch_size=16, n_partitions=1,
    )
    loop.add_seeds([url_of(0, 5)])
    loop.run()

    out = str(tmp_path / "archive")
    frontier = loop.engine.table.read()
    manifest = archive_crawled(spark, frontier, spark.read.parquet(cpath), out, n_parts=2)
    crawled = {
        r.canonical_url
        for r in frontier.filter(F.col("state") == STATE_CRAWLED)
        .select("canonical_url").collect()
    }
    assert manifest["n_records"].sum() == len(crawled)
    back = read_warc(spark, out).filter(F.col("warc_type") == "response")
    src = {r.url: bytes(r.bytes) for r in spark.read.parquet(cpath).collect()}
    got = {r.target_uri: bytes(r.payload) for r in back.collect()}
    assert set(got) == crawled
    assert all(got[u] == src[u] for u in got)


def test_revisit_record_framing(spark):
    """A revisit record (identical-payload-digest profile) frames with
    zero-length block, refers-to URI and the referred payload's digest."""
    from frontera_spark.sources.warc import REVISIT_PROFILE, warc_revisit_record

    df = spark.createDataFrame(
        [("https://m.test/dup", "https://a.test/orig", "sha1:abc123")],
        "url string, ref string, dig string",
    )
    raw = bytes(
        df.select(
            warc_revisit_record(
                F.col("url"), F.col("ref"), F.col("dig"), F.lit(WARC_TEST_DATE)
            ).alias("r")
        ).collect()[0].r
    )
    rec = parse_warc_bytes(raw)[0]
    assert rec["warc_type"] == "revisit"
    assert rec["content_length"] == 0 and rec["payload"] == b""
    assert rec["refers_to"] == "https://a.test/orig"
    assert rec["payload_digest"] == "sha1:abc123"
    assert rec["profile"] == REVISIT_PROFILE


def test_archive_dedup_mirrors_as_revisit_records(spark, tmp_path):
    """archive_crawled(dedup=True): per payload digest, one full response
    (min URL) + revisit references for the mirrors — the archive shrinks to
    distinct content while every capture stays addressable."""
    import hashlib

    from jobs.warc_archive import archive_crawled

    from frontera_spark import STATE_CRAWLED

    def _blob(tag, n=100):  # deterministic but incompressible payloads
        return b"".join(hashlib.sha256(f"{tag}{i}".encode()).digest() for i in range(n))

    blobs = {"x": _blob("x"), "y": _blob("y"), "z": b"Z"}
    rows = [  # 7 urls over 3 distinct payloads (x mirrored 3x, y 2x)
        ("https://a.test/x1", blobs["x"]), ("https://b.test/x2", blobs["x"]),
        ("https://c.test/x3", blobs["x"]), ("https://a.test/y1", blobs["y"]),
        ("https://c.test/y2", blobs["y"]), ("https://a.test/z", blobs["z"]),
        ("https://d.test/x4", blobs["x"]),
    ]
    corpus = spark.createDataFrame(
        [(u, b, "png") for u, b in rows], "url string, bytes binary, fmt string"
    )
    frontier = spark.createDataFrame(
        [(u, STATE_CRAWLED) for u, _ in rows], "canonical_url string, state int"
    )

    plain_out, dedup_out = str(tmp_path / "plain"), str(tmp_path / "dedup")
    m_plain = archive_crawled(spark, frontier, corpus, plain_out, n_parts=2)
    m_dedup = archive_crawled(spark, frontier, corpus, dedup_out, n_parts=2, dedup=True)
    assert m_plain["n_records"].sum() == 7 and m_dedup["n_records"].sum() == 7
    # mirrors stored as references: the archive shrinks to distinct content
    assert m_dedup["n_bytes"].sum() < m_plain["n_bytes"].sum()

    back = read_warc(spark, dedup_out).filter(F.col("warc_type") != "warcinfo").collect()
    full = {r.target_uri: r for r in back if r.warc_type == "response"}
    revs = [r for r in back if r.warc_type == "revisit"]
    assert len(full) == 3 and len(revs) == 4
    src = dict(rows)
    for r in revs:
        ref = full[r.refers_to]  # reference resolves to a stored response
        assert bytes(ref.payload) == src[r.target_uri]  # identical payload
        assert r.payload_digest == "sha1:" + hashlib.sha1(bytes(ref.payload)).hexdigest()
        assert bytes(r.payload) == b""
    # canonical copy per digest is the minimum URL (deterministic re-runs)
    for r in revs:
        assert r.refers_to == min(u for u, b in rows if b == src[r.target_uri])
    # the CDX index covers all 7 captures, revisits carrying the referred digest
    idx = {r.url: r for r in read_cdx(spark, dedup_out).collect()}
    assert len(idx) == 7
    for u, b in rows:
        assert idx[u].digest == "sha1:" + hashlib.sha1(b).hexdigest()


def test_crawled_corpus_archives_and_restores(spark, tmp_path):
    """End-to-end over the synthetic image+caption corpus: archive the
    fetched payload bytes, read them back, decode — pixels identical to the
    source corpus (the archive is lossless custody of the crawl)."""
    from frontera_spark.operators.multimodal import decode_image
    from frontera_spark.sources.corpus import write_corpus

    cpath = str(tmp_path / "corpus")
    write_corpus(spark, cpath, 24, 5, 7)
    corpus = spark.read.parquet(cpath)
    recs = corpus.select(
        warc_record(
            F.col("url"),
            F.col("bytes"),
            F.concat(F.lit("image/"), F.col("fmt")).alias("ct"),
            F.lit(WARC_TEST_DATE),
        ).alias("record")
    )
    out = str(tmp_path / "archive")
    write_warc(recs.repartition(3), out)
    back = read_warc(spark, out).filter(F.col("warc_type") == "response")
    pairs = {r.target_uri: bytes(r.payload) for r in back.collect()}
    src = {r.url: bytes(r.bytes) for r in corpus.collect()}
    assert pairs == src
    # archived payloads still decode
    any_url = next(iter(src))
    assert decode_image(pairs[any_url]).ndim == 3
