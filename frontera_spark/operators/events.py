"""Event-stream operators: sessionization and time-window rollups.

The crawl engine's activity log (spider log / scoring log in frontera,
``events.parquet`` in the driver's tables) is an append-only stream of
``(event_id, ts, user_id, event_type, value)`` rows. A training-data or
crawl-analytics pipeline needs the two classic stream shapes over it:

- **gap sessionization** — group a user's events into sessions separated by
  ≥ ``gap_s`` of inactivity (frontera has no analog; this is the standard
  web-log primitive, e.g. for per-crawler activity bursts);
- **tumbling-window rollup** — fixed-width time buckets per event type.

Both are single-shuffle plans at any scale:

- ``sessionize`` shuffles once on ``user_id`` and sort-windows inside each
  partition — at 10^12 events the shuffle is the whole cost and it is the
  minimum any gap-based definition needs (session identity is a running
  prefix property of each user's ordered history). Skewed users (one crawler
  generating 10^9 events) stay single-partition by definition of the
  semantics; cap with a pre-filter if a user can exceed a partition.
- ``session_rollup`` expresses the SAME grouping with Spark's native
  ``session_window`` (merge-on-overlap interval semantics) — whole-stage
  codegen, no Python, and the formulation Structured Streaming can run
  incrementally with a watermark (see ``streaming/sessions.py``).
- ``day_rollup`` is a hash aggregate on ``(bucket, event_type)`` — partial
  aggregation map-side, so the shuffle carries ~|buckets × types| rows, not
  |events|.

Two deliberately different formulations of sessionization exist so each can
oracle-check the other: the lag/cumsum form is pure ANSI SQL (DuckDB runs it
verbatim), the ``session_window`` form is Spark-native; their agreement is
pinned in tests/test_events.py and the driver gate (``session_stats``).

Boundary semantics match ``session_window`` (pinned by test_events.py): an
event exactly ``gap_s`` after its predecessor stays in the SAME session —
Spark merges when the next event lands on or before the current window end,
so a new session starts only when the gap is STRICTLY greater than ``gap_s``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the repo-wide Spark<->DuckDB float parity barrier: floor-based HALF_UP is
# bit-identical across both engines (Spark round() is HALF_UP, DuckDB's is
# HALF_EVEN — see driver_queries.q_quality_score)
def _barrier(col, scale: float = 1e4):
    return F.floor(col * scale + F.lit(0.5)) / scale


def _epoch_s(col="ts"):
    """Epoch seconds (double, microsecond fraction) from a TIMESTAMP_NTZ,
    timezone-independent: a plain NTZ->LTZ->double cast would shift by the
    session timezone, while ``timestampdiff`` against the NTZ epoch is pure
    wall-clock arithmetic — bit-identical to DuckDB's epoch_us(ts)/1e6."""
    us = F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})")
    return us.cast("double") / F.lit(1000000.0)


def sessionize(events: DataFrame, gap_s: float = 21600.0) -> DataFrame:
    """Per-event session ids: lag + running sum of new-session flags.

    Input: (user_id, event_id, ts, ...). Output: input columns +
    ``session_idx`` (0-based per user, in (ts, event_id) order).
    One shuffle on user_id; the two windows share one sort.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = _epoch_s()
    gap = ep - F.lag(ep).over(w)
    is_new = F.when(gap.isNull() | (gap > F.lit(float(gap_s))), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_idx", (F.sum(is_new).over(run) - 1).cast("bigint"))


def session_agg(events: DataFrame, gap_s: float = 21600.0) -> DataFrame:
    """The aggregation batch and streaming sessionization share: group by
    (user_id, session_window(ts, gap)), emit (user_id, start_s, n_events,
    dur_s, value_sum). ``events`` may be a batch frame or a watermarked
    streaming frame (streaming/sessions.py wraps it with a watermark +
    append-mode sink)."""
    ep = _epoch_s()
    grouped = events.groupBy(
        "user_id", F.session_window("ts", f"{int(gap_s)} seconds")
    ).agg(
        F.floor(F.min(ep)).cast("bigint").alias("start_s"),
        F.count("*").cast("bigint").alias("n_events"),
        _barrier(F.max(ep) - F.min(ep)).alias("dur_s"),
        _barrier(F.sum("value")).alias("value_sum"),
    )
    return grouped.select("user_id", "start_s", "n_events", "dur_s", "value_sum")


def session_rollup(events: DataFrame, gap_s: float = 21600.0) -> DataFrame:
    """Per-session aggregates via Spark-native ``session_window``.

    Output: user_id, start_s (epoch s of first event, floored to bigint),
    n_events, dur_s (span in s, 4-dp), value_sum (4-dp). Same single
    user_id-keyed exchange as ``sessionize`` but with merge-on-overlap
    interval state — the streaming-compatible formulation.
    """
    return session_agg(events, gap_s=gap_s)


def day_rollup(events: DataFrame, bucket_s: int = 86400) -> DataFrame:
    """Tumbling-window rollup: (epoch-day bucket, event_type) counts + sums.

    Epoch-arithmetic buckets (not ``F.window``) so the bucket id is a plain
    bigint — timezone-free and directly comparable across engines.
    """
    day = F.floor(_epoch_s() / F.lit(float(bucket_s))).cast("bigint")
    return (
        events.groupBy(day.alias("bucket"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            _barrier(F.sum("value")).alias("value_sum"),
        )
    )
