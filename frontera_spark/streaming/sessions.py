"""Streaming sessionization: the incremental form of operators/events.py.

``operators.events.session_rollup`` groups a batch events table with Spark's
native ``session_window``; this module runs the IDENTICAL aggregation over an
unbounded stream. That is the point of choosing ``session_window`` for the
batch formulation in the first place — the same merge-on-overlap interval
state machine runs incrementally under a watermark, so batch and stream give
byte-identical finalized sessions on the same input (pinned by
tests/test_stream_sessions.py).

Semantics at scale (10^12 events/day):
- state is one open interval per (user, session) — bounded by ACTIVE users,
  not by history, because ``withWatermark`` evicts a session's state as soon
  as the watermark passes its end (last event + gap);
- append mode emits a session exactly once, when it can no longer grow —
  an event arriving later than the watermark is dropped, not double-counted,
  so downstream sinks need no dedup;
- the stream shuffles once on ``user_id`` per micro-batch, same key as the
  batch plan — a skewed user is one state row, not a hot partition.

frontera has no analog (its stats are processing-time counters); this is the
standard web-log/crawl-telemetry primitive expressed Spark-natively.
"""

from __future__ import annotations

from frontera_spark.operators.events import session_agg

# the driver events table's column contract (TESTDATA.md)
EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def stream_session_rollup(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    gap_s: float = 21600.0,
    watermark_delay: str = "10 minutes",
    queryName: str = "sessions",
):
    """Incremental gap sessionization over a parquet file-stream of events
    (EVENTS_DDL rows; swap for ``format("kafka")`` + decode in production —
    the aggregation is source-agnostic). Emits FINALIZED sessions only
    (append mode): a session appears once the watermark passes its end.
    Sink is an in-memory table named ``queryName`` for tests; the writer is
    sink-agnostic."""
    ev = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    agg = session_agg(ev.withWatermark("ts", watermark_delay), gap_s=gap_s)
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
