"""Fused spider-log ingestion (FrontierEngine.ingest_results): one MERGE
commit must leave the table in exactly the state the unfused
record_results + links_extracted sequence does — same states, same seqs,
same seen set — while committing fewer snapshots."""

from pyspark.sql import functions as F

from frontera_spark import STATE_CRAWLED, STATE_ERROR, STATE_QUEUED
from frontera_spark.core.frontier import FrontierEngine


def _urls(spark, lo, hi):
    return spark.createDataFrame(
        [(f"https://h{i % 3:03d}.example.test/p/{i}", i) for i in range(lo, hi)],
        "url string, seq int",
    )


def _links(spark, rows):
    """rows: (url, parent_seq, link_pos, depth)"""
    return spark.createDataFrame(
        rows, "url string, parent_seq long, link_pos int, depth int"
    )


def _drive(spark, wd, fused: bool):
    eng = FrontierEngine(spark, wd, n_partitions=2, strategy="fifo")
    eng.add_seeds(_urls(spark, 0, 8))
    feed = eng.get_next_requests(8, mode="global")
    feed.cache().count()
    ok = feed.filter(F.col("seq") < 6)
    err = feed.filter(F.col("seq") >= 6)
    links = _links(
        spark,
        [
            (f"https://h{i % 3:03d}.example.test/child/{i}", i, 0, 1)
            for i in range(4)
        ]
        # one link that dedups out (already a seed)
        + [("https://h000.example.test/p/0", 0, 1, 1)],
    )
    if fused:
        n = eng.ingest_results(ok, err, links)
    else:
        eng.record_results(ok, err)
        n = eng.links_extracted(links)
    feed.unpersist()
    snap = eng.table.read().select(
        "fingerprint", F.coalesce("url", "canonical_url").alias("u"), "state", "seq"
    )
    rows = sorted(tuple(r) for r in snap.collect())
    return eng, n, rows


def test_fused_matches_separate(spark, tmp_path):
    eng_a, n_a, rows_a = _drive(spark, str(tmp_path / "a"), fused=False)
    eng_b, n_b, rows_b = _drive(spark, str(tmp_path / "b"), fused=True)
    assert n_a == n_b == 4
    assert rows_a == rows_b  # identical states, seqs, urls, fingerprints
    assert eng_b.count(STATE_CRAWLED) == 6
    assert eng_b.count(STATE_ERROR) == 2
    assert eng_b.count(STATE_QUEUED) == 4
    # the fusion's point: strictly fewer commits for the same end state
    assert eng_b.table.snapshot_id < eng_a.table.snapshot_id
    # dedup unaffected: re-offering everything queues nothing
    assert eng_b.add_seeds(_urls(spark, 0, 8)) == 0


def test_fused_with_no_new_links_still_marks(spark, tmp_path):
    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=2, strategy="fifo")
    eng.add_seeds(_urls(spark, 0, 4))
    feed = eng.get_next_requests(4, mode="global")
    feed.cache().count()
    # every extracted link is a duplicate of an existing row → zero inserts,
    # but the CRAWLED transitions must still commit (the _mark fallback)
    dup_links = _links(
        spark, [(f"https://h{i % 3:03d}.example.test/p/{i}", i, 0, 1) for i in range(4)]
    )
    n = eng.ingest_results(feed, None, dup_links)
    feed.unpersist()
    assert n == 0
    assert eng.count(STATE_CRAWLED) == 4
    assert eng.count(STATE_QUEUED) == 0


def test_fused_unknown_key_update_drops(spark, tmp_path):
    """A CRAWLED/ERROR row whose fingerprint is NOT in the frontier
    (foreign/malformed bus message, replay across a table reset) must no-op
    — same semantics as record_results/_mark (insert=False) — instead of
    falling into the fused merge's insert branch as a null-padded row."""
    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=2, strategy="fifo")
    eng.add_seeds(_urls(spark, 0, 4))
    feed = eng.get_next_requests(4, mode="global")
    feed.cache().count()
    # forge a result for a fingerprint the table has never seen
    foreign = spark.createDataFrame(
        [(123456789, 0, eng.jid)], "fingerprint long, partition_id int, jid int"
    )
    crawled = feed.select("fingerprint", "partition_id").withColumn(
        "jid", F.lit(eng.jid)
    ).unionByName(foreign)
    n = eng.ingest_results(
        crawled, None, _links(spark, [("https://h000.example.test/new", 0, 0, 1)])
    )
    feed.unpersist()
    assert n == 1
    snap = eng.table.read()
    # the foreign update dropped: no null-padded row, no extra key
    assert snap.filter(F.col("fingerprint") == 123456789).count() == 0
    assert snap.filter(F.col("canonical_url").isNull()).count() == 0
    assert snap.count() == 5  # 4 seeds + 1 new link
    assert eng.count(STATE_CRAWLED) == 4
    # parity check vs the unfused path on the same forged input
    eng2 = FrontierEngine(spark, str(tmp_path / "b"), n_partitions=2, strategy="fifo")
    eng2.add_seeds(_urls(spark, 0, 4))
    feed2 = eng2.get_next_requests(4, mode="global")
    feed2.cache().count()
    crawled2 = feed2.select("fingerprint", "partition_id").withColumn(
        "jid", F.lit(eng2.jid)
    ).unionByName(foreign)
    eng2.record_results(crawled2, None)
    eng2.links_extracted(_links(spark, [("https://h000.example.test/new", 0, 0, 1)]))
    feed2.unpersist()
    a = sorted(tuple(r) for r in eng.table.read().select("fingerprint", "state").collect())
    b = sorted(tuple(r) for r in eng2.table.read().select("fingerprint", "state").collect())
    assert a == b


def test_fused_respects_fencing(spark, tmp_path):
    wd = str(tmp_path / "eng")
    eng0 = FrontierEngine(spark, wd, n_partitions=2, jid=0)
    eng0.add_seeds(_urls(spark, 0, 4))
    feed = eng0.get_next_requests(4, mode="global")
    feed.cache().count()
    eng1 = FrontierEngine(spark, wd, n_partitions=2, jid=1)
    # stale-epoch results are fenced, but the links (new discoveries) land
    n = eng1.ingest_results(
        feed, None, _links(spark, [("https://h000.example.test/new", 0, 0, 1)])
    )
    feed.unpersist()
    assert n == 1
    assert eng1.count(STATE_CRAWLED) == 0
