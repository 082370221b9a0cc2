"""Snapshot-table layer tests (SURVEY.md M2): MERGE semantics, atomic commit,
partition-level copy-on-write, rollback/resume, lineage counters."""

import json
import os

import pytest
from pyspark.sql import functions as F

from frontera_spark.plans.snapshot import SnapshotTable

SCHEMA = "fingerprint long, url string, state int, score double, partition_id int"


@pytest.fixture
def table(spark, tmp_path):
    return SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, key=["fingerprint"])


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_empty_read(table):
    assert table.read().count() == 0
    assert table.snapshot_id == 0


def test_insert_then_upsert(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0), (2, "b", 0, 0.5, 1)]))
    assert table.snapshot_id == 1
    got = {r.fingerprint: r for r in table.read().collect()}
    assert set(got) == {1, 2}
    assert got[1].partition_id == 0

    # matched update + new insert in one merge
    table.upsert(_df(spark, [(1, "a", 2, 0.9, 0), (3, "c", 1, 0.1, 0)]))
    got = {r.fingerprint: r for r in table.read().collect()}
    assert got[1].state == 2 and got[1].score == 0.9
    assert got[2].state == 0  # untouched partition re-linked
    assert got[3].url == "c"


def test_partial_set_cols(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0)]))
    # update only `state`; score column must keep the target value
    table.upsert(_df(spark, [(1, "IGNORED", 2, 9.9, 0)]), set_cols=["state"])
    r = table.read().collect()[0]
    assert r.state == 2 and r.score == 0.5 and r.url == "a"


def test_copy_on_write_partition_reuse(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0), (2, "b", 0, 0.5, 1)]))
    m1 = table.manifest()
    table.upsert(_df(spark, [(3, "c", 0, 0.5, 0)]))  # touches only pid 0
    m2 = table.manifest()
    assert m2["dirs"]["1"] == m1["dirs"]["1"], "untouched partition must be re-linked, not rewritten"
    assert m2["dirs"]["0"] != m1["dirs"]["0"]
    assert m2["counters"] == {"0": 2, "1": 1}


def test_rollback_and_time_travel(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0)]))
    s1 = table.snapshot_id
    table.upsert(_df(spark, [(1, "a", 2, 0.5, 0)]))
    assert table.read().collect()[0].state == 2
    assert table.read(snapshot_id=s1).collect()[0].state == 0  # time travel
    table.rollback(s1)
    assert table.read().collect()[0].state == 0
    assert table.snapshot_id == s1


def test_reload_from_disk(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0)]))
    t2 = SnapshotTable.load(spark, table.path)
    assert t2.snapshot_id == 1
    assert t2.read().count() == 1


def test_delete_where(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0), (2, "b", 2, 0.5, 0), (3, "c", 0, 0.5, 1)]))
    table.delete_where(F.col("state") == 2)
    assert {r.fingerprint for r in table.read().collect()} == {1, 3}


def test_empty_merge_is_noop(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0)]))
    sid = table.snapshot_id
    table.upsert(_df(spark, []))
    assert table.snapshot_id == sid


def test_meta_counters(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0)]), meta={"next_seq": 10})
    table.upsert(_df(spark, [(2, "b", 0, 0.5, 0)]), meta={"iteration": 3})
    m = table.manifest()
    assert m["meta"] == {"next_seq": 10, "iteration": 3}


def test_partition_pruning(spark, table):
    table.upsert(_df(spark, [(i, f"u{i}", 0, 0.5, i % 4) for i in range(40)]))
    plan = table.read().filter(F.col("partition_id") == 2)._jdf.queryExecution().executedPlan().toString()
    # partition filter must appear as a PartitionFilters entry, i.e. pruned at scan
    assert "PartitionFilters" in plan
    assert table.read().filter(F.col("partition_id") == 2).count() == 10


def test_vacuum(spark, table, tmp_path):
    for i in range(5):
        table.upsert(_df(spark, [(i, "x", 0, 0.5, 0)]))
    data_root = os.path.join(table.path, "data")
    before = len(os.listdir(data_root))
    table.vacuum(keep_last=1)
    after = len(os.listdir(data_root))
    assert after < before
    assert table.read().count() == 5  # current snapshot intact


def test_atomic_current(spark, table):
    """CURRENT is valid JSON at every point (no partial writes visible)."""
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0)]))
    with open(os.path.join(table.path, "CURRENT")) as f:
        m = json.load(f)
    assert m["snapshot_id"] == table.snapshot_id


def test_merge_plan_broadcasts_small_source(spark, table):
    """Scale property: a batch-sized MERGE against a populated table must
    execute as broadcast joins (the table side never shuffles) — the reason
    upsert decomposes into left + anti instead of an unbroadcastable
    full_outer — and a merge into EMPTY partitions must contain no join at
    all (append fast path)."""
    bulk = spark.range(5000).select(
        F.col("id").alias("fingerprint"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(0).alias("state").cast("int"),
        F.lit(0.5).alias("score"),
        (F.col("id") % 4).cast("int").alias("partition_id"),
    )
    # append fast path: empty target -> no join nodes anywhere
    m = table.manifest()
    merged0 = table._merged_frame(bulk, None, True, {"0", "1", "2", "3"}, m)
    plan0 = merged0._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan0
    table.upsert(bulk)

    batch = spark.range(64).select(
        F.col("id").alias("fingerprint"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(1).alias("state").cast("int"),
        F.lit(0.9).alias("score"),
        (F.col("id") % 4).cast("int").alias("partition_id"),
    )
    m = table.manifest()
    merged = table._merged_frame(batch, ["state", "score"], True, {"0", "1", "2", "3"}, m)
    merged.collect()  # finalize the adaptive plan
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------- merge-on-read marks


def test_add_marks_overlay_no_rewrite(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0), (2, "b", 0, 0.5, 1)]))
    m1 = table.manifest()
    marks = spark.createDataFrame([(1, 0, 7)], "fingerprint long, partition_id int, state int")
    table.add_marks(marks, mark_cols=["state"])
    m2 = table.manifest()
    # O(batch) property: NO data partition was rewritten — only an overlay
    assert m2["dirs"] == m1["dirs"]
    assert m2["counters"] == m1["counters"]
    assert "0" in m2["marks"] and "1" not in m2["marks"]
    got = {r.fingerprint: r for r in table.read().collect()}
    assert got[1].state == 7, "overlay must override the base value"
    assert got[1].score == 0.5, "non-mark columns come from base"
    assert got[2].state == 0
    # base view bypasses the overlay
    raw = {r.fingerprint: r for r in table.read(with_marks=False).collect()}
    assert raw[1].state == 0


def test_add_marks_driver_write_parity(spark, table):
    """n_rows ≤ SMALL_MARK_ROWS routes through the driver-side pyarrow
    write; the overlay must be indistinguishable from the Spark-written
    one — same leaf layout, same read()/read_mark_keys view, absorbed by
    COW the same way."""
    table.upsert(
        _df(spark, [(1, "a", 0, 0.5, 0), (2, "b", 0, 0.5, 1), (3, "c", 0, 0.5, 1)])
    )
    marks = spark.createDataFrame(
        [(1, 0, 7), (3, 1, 8)], "fingerprint long, partition_id int, state int"
    )
    table.add_marks(marks, mark_cols=["state"], n_rows=2)
    m = table.manifest()
    assert set(m["marks"]) == {"0", "1"}
    # leaf layout matches the Spark writer: marks-<sid>-*/partition_id=<p>
    for pid, leafs in m["marks"].items():
        for leaf in leafs:
            assert leaf.split("/")[1] == f"partition_id={pid}"
    got = {r.fingerprint: r.state for r in table.read().collect()}
    assert got == {1: 7, 2: 0, 3: 8}
    mk = {tuple(r) for r in table.read_mark_keys().collect()}
    assert mk == {(1, 0), (3, 1)}
    # a COW merge absorbs driver-written marks exactly like Spark-written
    table.upsert(_df(spark, [(2, "b", 4, 0.5, 0)]), set_cols=["state"])
    assert "0" not in table.manifest()["marks"]
    raw = {r.fingerprint: r.state for r in table.read(with_marks=False).collect()}
    assert raw[1] == 7 and raw[2] == 4


def test_vacuum_reclaims_absorbed_mark_dirs(spark, table):
    import os

    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0)]))
    marks = spark.createDataFrame([(1, 0, 9)], "fingerprint long, partition_id int, state int")
    table.add_marks(marks, mark_cols=["state"], n_rows=1)
    # absorb the mark, then age the referencing manifests out of the window
    table.upsert(_df(spark, [(1, "a", 5, 0.5, 0)]), set_cols=["state"])
    for _ in range(4):
        table.upsert(_df(spark, [(1, "a", 5, 0.5, 0)]), set_cols=["state"])
    table.vacuum(keep_last=2)
    roots = os.listdir(table._data_root)
    assert not [d for d in roots if d.startswith("marks-")], roots
    assert table.read().collect()[0].state == 5


def test_cow_absorbs_marks(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0), (2, "b", 0, 0.5, 0)]))
    marks = spark.createDataFrame([(1, 0, 7)], "fingerprint long, partition_id int, state int")
    table.add_marks(marks, mark_cols=["state"])
    # COW merge on partition 0 (updates row 2) must bake row 1's mark into
    # the rewritten files and drop the mark
    table.upsert(_df(spark, [(2, "b", 3, 0.5, 0)]), set_cols=["state"])
    assert table.manifest()["marks"] == {}
    raw = {r.fingerprint: r for r in table.read(with_marks=False).collect()}
    assert raw[1].state == 7, "absorbed mark must survive in base data"
    assert raw[2].state == 3


def test_clear_marks_metadata_only(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0)]))
    marks = spark.createDataFrame([(1, 0, 9)], "fingerprint long, partition_id int, state int")
    table.add_marks(marks, mark_cols=["state"])
    assert table.read().collect()[0].state == 9
    table.clear_marks()
    assert table.manifest()["marks"] == {}
    assert table.read().collect()[0].state == 0, "cleared marks revert to base"


def test_empty_marks_commit_advances_meta(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0)]))
    sid0 = table.snapshot_id
    empty = spark.createDataFrame([], "fingerprint long, partition_id int, state int")
    table.add_marks(empty, mark_cols=["state"], meta={"iteration": 42})
    assert table.snapshot_id == sid0 + 1
    assert table.manifest()["meta"]["iteration"] == 42
    assert table.manifest()["marks"] == {}


def test_latest_mark_wins(spark, table):
    table.upsert(_df(spark, [(1, "a", 0, 0.5, 0)]))
    mk = lambda v: spark.createDataFrame([(1, 0, v)], "fingerprint long, partition_id int, state int")
    table.add_marks(mk(5), mark_cols=["state"])
    table.add_marks(mk(6), mark_cols=["state"])
    assert table.read().collect()[0].state == 6


def test_marks_overlay_plan_broadcasts_and_keeps_pushdown(spark, table):
    """Scale properties of the merge-on-read overlay: the mark side joins as
    a BROADCAST build (the base table never shuffles to apply marks), and
    filters on non-mark base columns still reach the parquet scan as
    PushedFilters — the overlay must not cost the queue read its
    state/partition pruning."""
    bulk = spark.range(5000).select(
        F.col("id").alias("fingerprint"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(0).alias("state").cast("int"),
        F.lit(0.5).alias("score"),
        (F.col("id") % 4).cast("int").alias("partition_id"),
    )
    table.upsert(bulk)
    marks = spark.range(64).select(
        F.col("id").alias("fingerprint"),
        (F.col("id") % 4).cast("int").alias("partition_id"),
        F.lit(0.9).alias("score"),
    )
    table.add_marks(marks, mark_cols=["score"])
    q = table.read().filter((F.col("state") == 0) & (F.col("partition_id") == 1))
    q.collect()  # finalize the adaptive plan
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [IsNotNull(state), EqualTo(state,0)" in plan, plan
