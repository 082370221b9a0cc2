"""Fast-append + compaction (the MOR insert path).

``SnapshotTable.append`` commits new rows as EXTRA leaf dirs without ever
reading the target — the O(batch) insert a 10^10-row frontier needs —
and ``compact`` is the maintenance rewrite that folds the accumulated dirs
(and over-long mark overlays) back down. These tests pin:

- append == upsert(insert) table contents, counters exact;
- dirs accumulate per append and reads stay correct throughout;
- compact folds to one dir per heavy partition, absorbs marks, and is
  bit-identical to the pre-compaction read();
- the frontier's pure-insert _finalize path (seeds / link scheduling with
  no ride-along updates) takes append and stays parity-green;
- the crawl loop's metadata-gated compact_if_needed fires and preserves
  the crawl.
"""

import os

import pytest
from pyspark.sql import functions as F

from frontera_spark.plans.snapshot import SnapshotTable

SCHEMA = "k long, v string, partition_id int"


def _rows(spark, pairs):
    return spark.createDataFrame(
        [(int(k), v, int(k) % 4) for k, v in pairs], SCHEMA
    )


def _collect(t):
    return sorted(
        (r["k"], r["v"], r["partition_id"]) for r in t.read().collect()
    )


@pytest.fixture()
def two_tables(spark, tmp_path):
    a = SnapshotTable.create(spark, str(tmp_path / "a"), SCHEMA, key=["k"])
    b = SnapshotTable.create(spark, str(tmp_path / "b"), SCHEMA, key=["k"])
    return a, b


def test_append_matches_upsert_contents_and_counters(spark, two_tables):
    a, b = two_tables
    base = _rows(spark, [(i, f"v{i}") for i in range(20)])
    a.overwrite(base)
    b.overwrite(base)
    fresh = _rows(spark, [(i, f"v{i}") for i in range(20, 35)])
    a.append(fresh)
    b.upsert(fresh)
    assert _collect(a) == _collect(b)
    assert a.counters() == b.counters()


def test_append_accumulates_dirs_and_stays_readable(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, key=["k"])
    t.overwrite(_rows(spark, [(0, "v0"), (1, "v1"), (2, "v2"), (3, "v3")]))
    for gen in range(3):
        lo = 4 + gen * 4
        t.append(_rows(spark, [(i, f"v{i}") for i in range(lo, lo + 4)]))
    m = t.manifest()
    # each append added one leaf dir to each of the 4 partitions
    assert all(len(ds) == 4 for ds in m["dirs"].values())
    assert _collect(t) == [(i, f"v{i}", i % 4) for i in range(16)]
    assert sum(int(c) for c in t.counters().values()) == 16


def test_append_empty_is_noop_and_meta_commits(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, key=["k"])
    t.overwrite(_rows(spark, [(0, "v0")]))
    sid = t.snapshot_id
    empty = spark.createDataFrame([], SCHEMA)
    assert t.append(empty) == sid  # no-op, no new snapshot
    assert t.append(empty, meta={"tick": 7}) == sid + 1  # meta-only commit
    assert t.manifest()["meta"]["tick"] == 7
    assert _collect(t) == [(0, "v0", 0)]


def test_compact_folds_dirs_absorbs_marks_read_identical(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, key=["k"])
    t.overwrite(_rows(spark, [(i, f"v{i}") for i in range(8)]))
    for gen in range(4):
        lo = 8 + gen * 8
        t.append(_rows(spark, [(i, f"v{i}") for i in range(lo, lo + 8)]))
    # overlay a mark on some keys so compaction has marks to absorb
    marked = _rows(spark, [(1, "m1"), (5, "m5")])
    t.add_marks(marked.select("k", "partition_id", "v"), mark_cols=["v"], n_rows=2)
    before = _collect(t)
    assert t.maintenance_stats()["max_dirs"] == 5
    sid = t.compact(max_dirs=2)
    m = t.manifest(sid)
    assert all(len(ds) == 1 for ds in m["dirs"].values())
    assert m["marks"] == {}  # absorbed into the rewrite
    assert _collect(t) == before  # bit-identical through the overlay
    assert before[1] == (1, "m1", 1) and before[5] == (5, "m5", 1)
    assert sum(int(c) for c in t.counters().values()) == 40


def test_compact_below_threshold_is_metadata_noop(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, key=["k"])
    t.overwrite(_rows(spark, [(0, "v0")]))
    t.append(_rows(spark, [(1, "v1")]))
    sid = t.snapshot_id
    assert t.compact(max_dirs=4) == sid  # nothing heavy: no new snapshot


def test_finalize_pure_insert_takes_append_no_target_rewrite(spark, tmp_path):
    """Scheduling fresh URLs with no ride-along updates must append: the
    pre-existing partitions' leaf dirs survive unchanged in the new manifest
    (a COW merge would have replaced them)."""
    from frontera_spark.core.frontier import FrontierEngine

    eng = FrontierEngine(spark, str(tmp_path / "w"), n_partitions=4)
    eng.add_seeds(
        spark.createDataFrame(
            [(f"http://s{i}.example.com/",) for i in range(6)], "url string"
        )
    )
    before_dirs = {
        p: list(ds) for p, ds in eng.table.manifest()["dirs"].items()
    }
    eng.add_seeds(
        spark.createDataFrame(
            [(f"http://t{i}.example.com/",) for i in range(6)], "url string"
        )
    )
    after = eng.table.manifest()["dirs"]
    for p, ds in before_dirs.items():
        assert after[p][: len(ds)] == ds, "append must extend, not rewrite"
    # and the rows are all there, each exactly once
    urls = [
        r["u"]
        for r in eng.table.read()
        .select(F.coalesce("url", "canonical_url").alias("u"))
        .collect()
    ]
    assert len(urls) == len(set(urls)) == 12


def test_crawl_loop_compacts_and_stays_green(spark, tmp_path, monkeypatch):
    """A multi-iteration crawl under a tiny COMPACT_MAX_DIRS must trigger
    compaction and still crawl exactly the oracle's page set."""
    from frontera_spark import STATE_CRAWLED
    from frontera_spark.core.frontier import FrontierEngine
    from frontera_spark.core.oracle import crawl_sequence
    from frontera_spark.sources.corpus import url_of, write_corpus
    from frontera_spark.streaming.loop import CrawlLoop

    corpus_dir = str(tmp_path / "corpus")
    write_corpus(spark, corpus_dir, 24, 5, 42)
    monkeypatch.setattr(FrontierEngine, "COMPACT_MAX_DIRS", 1)
    loop = CrawlLoop(
        spark, str(tmp_path / "w"), corpus_dir, corpus_seed=42,
        strategy="bfs", batch_size=8, n_partitions=2, mode="global",
    )
    seeds = [url_of(0, 5)]
    loop.add_seeds(seeds)
    hist = loop.run()
    rows = spark.read.parquet(corpus_dir).select("url", "out_links").collect()
    graph = {r.url: list(r.out_links) for r in rows}
    exp_order, _ = crawl_sequence(graph, seeds, "bfs", 8)
    crawled = (
        loop.engine.table.read().filter(F.col("state") == STATE_CRAWLED).count()
    )
    assert crawled == sum(m["n_fetched"] for m in hist) == len(exp_order)
    assert loop.engine.table.maintenance_stats()["max_dirs"] <= 2
