"""Revisiting timer (X6) and job-epoch fencing (X7) — SURVEY.md §2.9."""

from pyspark.sql import functions as F

from frontera_spark import STATE_CRAWLED, STATE_QUEUED
from frontera_spark.core.frontier import FrontierEngine


def _urls(spark, lo, hi):
    return spark.createDataFrame(
        [(f"https://h{i % 3:03d}.example.test/p/{i}", i) for i in range(lo, hi)],
        "url string, seq int",
    )


def test_revisit_requeues_after_due_tick(spark, tmp_path):
    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=2, strategy="fifo")
    eng.add_seeds(_urls(spark, 0, 10))

    batch = eng.get_next_requests(10, mode="global")
    eng.page_crawled(batch)
    batch.unpersist()
    assert eng.count(STATE_CRAWLED) == 10

    # re-queue 4 rows for recrawl 2 ticks out
    n = eng.revisit(F.col("seq") < 4, after_iterations=2)
    assert n == 4
    assert eng.count(STATE_QUEUED) == 4

    # tick 2 (iteration -> 2): crawl_at = 3, not yet due
    early = eng.get_next_requests(10, mode="global")
    assert early.count() == 0
    early.unpersist()
    # tick 3: due now
    due = eng.get_next_requests(10, mode="global")
    assert due.count() == 4
    # revisited rows keep their original fingerprints/seqs (still seen)
    assert {r.seq for r in due.collect()} == {0, 1, 2, 3}
    due.unpersist()


def test_revisited_rows_still_dedup(spark, tmp_path):
    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=2)
    eng.add_seeds(_urls(spark, 0, 10))
    batch = eng.get_next_requests(10, mode="global")
    eng.page_crawled(batch)
    batch.unpersist()
    eng.revisit(F.lit(True), after_iterations=5)
    # offering the same URLs again must still dedup to zero
    assert eng.add_seeds(_urls(spark, 0, 10)) == 0


def test_stale_jid_results_are_fenced(spark, tmp_path):
    wd = str(tmp_path / "eng")
    eng0 = FrontierEngine(spark, wd, n_partitions=2, jid=0)
    eng0.add_seeds(_urls(spark, 0, 6))
    feed = eng0.get_next_requests(6, mode="global")
    feed.cache().count()

    # job epoch rolls over (new_job_id): a new engine with jid=1 must ignore
    # results minted under jid=0
    eng1 = FrontierEngine(spark, wd, n_partitions=2, jid=1)
    eng1.page_crawled(feed)
    assert eng1.count(STATE_CRAWLED) == 0  # all fenced out

    # the same results applied by the matching epoch do land
    eng0b = FrontierEngine(spark, wd, n_partitions=2, jid=0)
    eng0b.page_crawled(feed)
    assert eng0b.count(STATE_CRAWLED) == 6
    feed.unpersist()


def test_canonical_solver_dedups_redirect_aliases(spark, tmp_path):
    """P4/E6: links arriving via different redirect chains that resolve to
    the same canonical URL collapse to ONE frontier row; corporate variant
    prefers the site root hop."""
    eng = FrontierEngine(spark, str(tmp_path / "eng_b"), n_partitions=1, strategy="fifo")
    links = spark.createDataFrame(
        [
            ("https://a.example.test/landing?x=1", ["https://a.example.test/p/1", "https://a.example.test/landing?x=1"], 0),
            ("https://a.example.test/other", ["https://a.example.test/p/1"], 1),
            ("https://b.example.test/p/2", None, 2),
        ],
        "url string, redirect_urls array<string>, seq int",
    )
    n = eng.add_seeds(links)
    # both chains resolve to .../p/1 (Basic = first hop) + the chainless row
    assert n == 2
    urls = {r.canonical_url for r in eng.table.read().collect()}
    assert urls == {"https://a.example.test/p/1", "https://b.example.test/p/2"}

    eng2 = FrontierEngine(
        spark, str(tmp_path / "eng_c"), n_partitions=1, strategy="fifo",
        canonical_solver="corporate",
    )
    links2 = spark.createDataFrame(
        [
            ("https://a.example.test/deep?utm=x",
             ["https://a.example.test/deep?utm=x", "https://a.example.test/", "https://a.example.test/home"], 0),
            ("https://b.example.test/deep",
             ["https://b.example.test/deep", "https://b.example.test/final"], 1),
        ],
        "url string, redirect_urls array<string>, seq int",
    )
    assert eng2.add_seeds(links2) == 2
    urls2 = {r.canonical_url for r in eng2.table.read().collect()}
    # chain 1 → site root; chain 2 has no root → Basic (first hop)
    assert urls2 == {"https://a.example.test/", "https://b.example.test/deep"}


def test_backpressure_gate_skips_lagging_partitions(spark, tmp_path):
    """X4/A5: partitions with in-flight backlog >= max_pending produce no new
    feed rows until their consumers catch up (frontera offset-lag gate)."""
    eng = FrontierEngine(spark, str(tmp_path / "eng_bp"), n_partitions=2, strategy="fifo")
    eng.add_seeds(_urls(spark, 0, 20))
    # mark a batch in-flight, never crawl it
    b1 = eng.get_next_requests(6, mode="per_partition")
    lag_pids = {r.partition_id for r in b1.collect()}
    b1.unpersist()
    assert eng.pending_counts() and set(eng.pending_counts()) == lag_pids

    # gated pop: lagging partitions are excluded
    b2 = eng.get_next_requests(6, mode="per_partition", max_pending=1)
    got_pids = {r.partition_id for r in b2.collect()}
    b2.unpersist()
    assert got_pids.isdisjoint(lag_pids)

    # consumer catches up → partition produces again
    b1b = eng.table.read().filter(F.col("batch_id").isNotNull())
    eng.page_crawled(b1b)
    assert eng.pending_counts() == {}
    b3 = eng.get_next_requests(6, mode="per_partition", max_pending=1)
    assert b3.count() > 0
    b3.unpersist()


def test_middleware_chain(spark, tmp_path):
    """E2: user middlewares run in order on every seed/link batch after
    canonicalization (frontera's add_seeds/links_extracted chain)."""
    calls = []

    def tag_depth(df):
        calls.append("tag_depth")
        return df.withColumn(
            "depth", F.when(F.col("host") == "b.example.test", 5).otherwise(F.col("depth"))
        )

    def drop_admin(df):
        calls.append("drop_admin")
        return df.filter(~F.col("canonical_url").contains("/admin"))

    eng = FrontierEngine(
        spark, str(tmp_path / "eng_mw"), n_partitions=1, strategy="bfs",
        middlewares=[tag_depth, drop_admin],
    )
    n = eng.add_seeds(
        spark.createDataFrame(
            [
                ("https://a.example.test/p", 0),
                ("https://b.example.test/q", 1),
                ("https://a.example.test/admin/x", 2),
            ],
            "url string, seq int",
        )
    )
    assert n == 2  # /admin dropped by middleware
    assert calls == ["tag_depth", "drop_admin"]
    depths = {r.canonical_url: r.depth for r in eng.table.read().collect()}
    assert depths["https://b.example.test/q"] == 5
    assert depths["https://a.example.test/p"] == 0
