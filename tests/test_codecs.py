"""Codec round-trips (S8) + bus partition-key parity (X1/X2) — frontera
tests/test_codecs.py analogue over the JSON edge."""

import json
import zlib

from pyspark.sql import functions as F

from frontera_spark.streaming.codecs import (
    decode_feed,
    decode_results,
    encode_feed,
    encode_results,
)

FEED_ROWS = [
    (-7538969701922983563, "https://a.example.test/p?x=1", "https://a.example.test/p?x=1",
     "a.example.test", 0.5, 1, 11, 0, 3),
    (4242, "https://b.example.test/q", "https://b.example.test/q",
     "b.example.test", 1.0, 0, 12, 0, 3),
]
FEED_SCHEMA = (
    "fingerprint long, url string, canonical_url string, host string, "
    "score double, depth int, seq long, jid int, batch_id long"
)


def test_feed_roundtrip_and_host_key(spark):
    feed = spark.createDataFrame(FEED_ROWS, FEED_SCHEMA)
    msgs = encode_feed(feed, partitions=8)
    rows = msgs.collect()
    # key = crc32(host) % 8 (Crc32NamePartitioner parity, X2)
    for r in rows:
        host = json.loads(r.value)["host"]
        signed = zlib.crc32(host.encode()) - (1 << 32) if zlib.crc32(host.encode()) >= (1 << 31) else zlib.crc32(host.encode())
        assert int(r.key) == signed % 8
    back = decode_feed(msgs)
    got = {tuple(r) for r in back.select(*[c.split()[0] for c in FEED_SCHEMA.split(", ")]).collect()}
    assert got == set(FEED_ROWS)


def test_results_roundtrip_fingerprint_key_and_garbage(spark):
    results = spark.createDataFrame(
        [
            (-7538969701922983563, "https://a.example.test/p", "a.example.test",
             3, 11, 1, 0, ["https://a.example.test/x"]),
            (17, "https://b.example.test/q", "b.example.test", 1, 12, 0, 0, []),
        ],
        "fingerprint long, canonical_url string, host string, partition_id int, "
        "seq long, depth int, jid int, out_links array<string>",
    )
    msgs = encode_results(results, partitions=4)
    for r in msgs.collect():
        fp = json.loads(r.value)["fingerprint"]
        assert int(r.key) == fp % 4  # FingerprintPartitioner parity (X1)

    # malformed + foreign-type messages are dropped, not fatal
    noisy = msgs.unionByName(
        spark.createDataFrame(
            [("0", "{not json"), ("0", '{"type": "unknown", "fingerprint": 1}')],
            "key string, value string",
        )
    )
    back = decode_results(noisy)
    assert back.count() == 2
    assert {r.fingerprint for r in back.collect()} == {-7538969701922983563, 17}
    assert all(r.status_code == 200 for r in back.collect())
