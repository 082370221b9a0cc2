"""Codecs (S8): JSON encode/decode at the engine's message-bus edges.

Reference parity: frontera's codec pair (frontera/contrib/backends/remote/
codecs/msgpack.py:~1-190, json.py:~1-180) serializes the three bus streams —
spider feed (batches to fetch), spider log (crawl results), scoring log.
Inside this engine those streams are DataFrames (SURVEY.md §1.5), so the
internal representation is Tungsten/Arrow and needs no codec; these helpers
exist for the EDGES, where an external spider fleet or a Kafka topic meets
the engine:

- ``encode_feed`` / ``decode_feed``: spider-feed rows ⇄ one JSON string per
  message, keyed by **host crc32 partition** (Crc32NamePartitioner, X2) so a
  Kafka sink with this key gives one-host-one-consumer politeness for free.
- ``encode_results`` / ``decode_results``: spider-log rows ⇄ JSON, keyed by
  **fingerprint partition** (FingerprintPartitioner, X1) so one strategy
  worker sees a URL's whole history.

The (key, value) column shape is exactly what Spark's Kafka source/sink
reads/writes (``writeStream.format("kafka")``), making the Structured
Streaming drop-in a config change, not a code change. Pure built-in
functions (to_json/from_json) — zero Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frontera_spark.functions.fingerprint import (
    fingerprint_partition_id_col,
    partition_id_col,
)

FEED_MSG_SCHEMA = (
    "type string, fingerprint long, url string, canonical_url string, "
    "host string, score double, depth int, seq long, jid int, batch_id long"
)

RESULT_MSG_SCHEMA = (
    "type string, fingerprint long, canonical_url string, host string, "
    "partition_id int, seq long, depth int, jid int, status_code int, "
    "out_links array<string>, fetched_at timestamp"
)  # fetched_at: optional event time (NULL when a spider omits it)


def encode_feed(feed: DataFrame, partitions: int) -> DataFrame:
    """Feed batch → (key, value) JSON messages, host-partitioned (X2)."""
    body = F.struct(
        F.lit("fetch_request").alias("type"),
        "fingerprint",
        F.col("url"),
        "canonical_url",
        "host",
        "score",
        "depth",
        "seq",
        "jid",
        "batch_id",
    )
    return feed.select(
        partition_id_col(F.col("host"), partitions).cast("string").alias("key"),
        F.to_json(body).alias("value"),
    )


def decode_feed(messages: DataFrame) -> DataFrame:
    """(value json) → feed rows; malformed JSON → NULL row, filtered."""
    parsed = messages.select(F.from_json("value", FEED_MSG_SCHEMA).alias("m"))
    return (
        parsed.filter(F.col("m").isNotNull() & (F.col("m.type") == "fetch_request"))
        .select("m.*")
        .drop("type")
    )


def encode_results(results: DataFrame, partitions: int, status_code=None) -> DataFrame:
    """Crawl results → (key, value) JSON, fingerprint-partitioned (X1):
    the spider-log contract — one partition sees a URL's whole history."""
    body = F.struct(
        F.lit("page_crawled").alias("type"),
        "fingerprint",
        "canonical_url",
        "host",
        "partition_id",
        "seq",
        "depth",
        "jid",
        (F.lit(200) if status_code is None else status_code).cast("int").alias("status_code"),
        "out_links",
        (
            F.col("fetched_at")
            if "fetched_at" in results.columns
            else F.lit(None).cast("timestamp")
        ).alias("fetched_at"),
    )
    return results.select(
        fingerprint_partition_id_col(F.col("fingerprint"), partitions)
        .cast("string")
        .alias("key"),
        F.to_json(body).alias("value"),
    )


def decode_results(messages: DataFrame) -> DataFrame:
    parsed = messages.select(F.from_json("value", RESULT_MSG_SCHEMA).alias("m"))
    return (
        parsed.filter(F.col("m").isNotNull() & (F.col("m.type") == "page_crawled"))
        .select("m.*")
        .drop("type")
    )
