"""Streaming sessionization (streaming/sessions.py): finalized sessions from
the watermarked stream must equal the batch session_rollup on the same input,
and unfinalizable tail sessions must be withheld (append semantics)."""

import datetime as dt

from pyspark.sql import functions as F

from frontera_spark.operators.events import session_rollup
from frontera_spark.streaming.sessions import EVENTS_DDL, stream_session_rollup

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)
GAP = 60.0  # 1 minute sessions for the fixture


def _frame(spark, rows):
    """rows: (event_id, user_id, offset_seconds, value)"""
    data = [
        (int(e), T0 + dt.timedelta(seconds=off), int(u), "e", float(v), "{}")
        for (e, u, off, v) in rows
    ]
    return spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in data],
        EVENTS_DDL,
    )


def _write_file(spark, rows, path):
    """One parquet FILE (not a Spark output dir): the file stream lists only
    files under the source path."""
    import pyarrow.parquet as pq

    tbl = _frame(spark, rows).toArrow()
    pq.write_table(tbl, path)


def test_stream_matches_batch_on_closed_sessions(spark, tmp_path):
    src = tmp_path / "ev_in"
    src.mkdir()

    # batch 1: two users, two sessions for user 1 (gap 300 s > 60 s)
    real = [
        (0, 1, 0.0, 1.0),
        (1, 1, 30.0, 2.0),
        (2, 1, 30.0 + 300.0, 4.0),
        (3, 2, 10.0, 8.0),
    ]
    _write_file(spark, real, str(src / "f1.parquet"))
    # batch 2: a sentinel far in the future drives the watermark past every
    # real session's end so append mode finalizes them; the sentinel's own
    # session stays open and must be withheld
    sentinel = [(99, 999, 86400.0 * 2, 0.0)]
    _write_file(spark, sentinel, str(src / "f2.parquet"))

    q = stream_session_rollup(
        spark,
        str(src),
        str(tmp_path / "ckpt"),
        gap_s=GAP,
        watermark_delay="10 seconds",
        queryName="sess_test",
    )
    q.awaitTermination(180)

    got = sorted(
        tuple(r) for r in spark.sql("select * from sess_test").collect()
    )
    want = sorted(
        tuple(r)
        for r in session_rollup(_frame(spark, real), GAP)
        .filter(F.col("user_id") != 999)
        .collect()
    )
    assert got == want  # byte-identical to the batch formulation
    assert len(got) == 3  # 2 sessions for user 1 + 1 for user 2
    assert all(r[0] != 999 for r in got)  # open tail session withheld
