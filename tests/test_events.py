"""Sessionization + rollup operators (operators/events.py): the two
formulations (lag/cumsum vs native session_window) must agree, including on
the exact-gap boundary, and rollups must match a hand computation."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from frontera_spark.operators.events import day_rollup, session_rollup, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
GAP = 21600.0  # 6 h


def _ev(spark, rows):
    """rows: (user_id, offset_seconds, value)"""
    data = [
        (i, T0 + dt.timedelta(seconds=off), int(u), "e", float(v))
        for i, (u, off, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: exact-gap boundary MERGES (session_window is inclusive);
        # strictly-greater gap splits
        (1, 0.0, 1.0),
        (1, 100.0, 2.0),
        (1, 100.0 + GAP, 4.0),        # exactly gap after prev -> SAME session
        (1, 100.0 + GAP + 10.0, 8.0),
        (1, 100.0 + GAP + 10.0 + GAP + 0.000001, 16.0),  # just past gap -> new
        # user 2: single event
        (2, 50.0, 3.0),
        # user 3: gap just UNDER the threshold -> one session
        (3, 0.0, 5.0),
        (3, GAP - 0.000001, 7.0),
    ]
    return _ev(spark, rows)


def test_sessionize_boundary_semantics(events):
    out = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in sessionize(events, GAP).collect()
    }
    assert out[(1, 0)] == 0 and out[(1, 1)] == 0
    assert out[(1, 2)] == 0 and out[(1, 3)] == 0  # exact gap merges
    assert out[(1, 4)] == 1  # strictly past the gap -> new session
    assert out[(2, 5)] == 0
    assert out[(3, 6)] == 0 and out[(3, 7)] == 0  # under-gap stays merged


def test_two_formulations_agree(events):
    """lag/cumsum-derived per-session aggregates == session_window's."""
    per_event = sessionize(events, GAP)
    ep = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("double") / F.lit(1000000.0)
    derived = (
        per_event.groupBy("user_id", "session_idx")
        .agg(
            F.floor(F.min(ep)).cast("bigint").alias("start_s"),
            F.count("*").cast("bigint").alias("n_events"),
            (F.floor((F.max(ep) - F.min(ep)) * 1e4 + F.lit(0.5)) / 1e4).alias("dur_s"),
            (F.floor(F.sum("value") * 1e4 + F.lit(0.5)) / 1e4).alias("value_sum"),
        )
        .drop("session_idx")
    )
    a = sorted(tuple(r) for r in derived.collect())
    b = sorted(tuple(r) for r in session_rollup(events, GAP).collect())
    assert a == b
    assert len(b) == 4  # 2 + 1 + 1 sessions


def test_sessionize_on_driver_events(spark):
    """Real events table: session count is consistent between formulations
    and every session's span is under no constraint but starts are unique
    per (user, session)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_lag = (
        sessionize(ev, GAP)
        .agg((F.countDistinct("user_id", "session_idx")).alias("n"))
        .first()["n"]
    )
    n_sw = session_rollup(ev, GAP).count()
    assert n_lag == n_sw > 15  # >= one session per user (15 users at sf0.001)


def test_day_rollup(events):
    rows = day_rollup(events, bucket_s=86400).collect()
    # all fixture events land in the first epoch-day bucket of 2024-01-01
    # except user 1's last two (> 6 h after midnight they are still < 24 h)
    assert sum(r["n_events"] for r in rows) == 8
    buckets = {r["bucket"] for r in rows}
    assert buckets == {19723}  # 2024-01-01 = epoch day 1704067200 / 86400
