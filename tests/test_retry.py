"""Transient-error retry policy (core/retry.py + CrawlLoop wiring).

frontera analog: strategy/__init__.py:~100-120 — ``page_error`` lets a
CrawlingStrategy re-schedule failed requests; the engine's version is
bounded exponential backoff over a folded per-page error state, applied
with ``requeue_due(from_state=STATE_ERROR)``.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from frontera_spark import STATE_CRAWLED, STATE_ERROR, STATE_QUEUED
from frontera_spark.core.frontier import FrontierEngine
from frontera_spark.core.retry import fold_error_slice, retry_schedule
from frontera_spark.sources.corpus import host_of, url_of, write_corpus
from frontera_spark.streaming.loop import CrawlLoop

US = 1_000_000


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "fingerprint long, partition_id int, iteration long"
    )


def test_fold_error_slice_associative(spark):
    """state ⊕ (s1 ∪ s2) == (state ⊕ s1) ⊕ s2 — the property the loop's
    incremental tick depends on (slices arrive one iteration at a time)."""
    rows = [
        (1, 0, 1), (1, 0, 3), (1, 0, 7),   # page 1: three errors
        (2, 1, 2),                          # page 2: one error
        (3, 0, 4), (3, 0, 6),               # page 3: two errors
    ]
    full = fold_error_slice(None, _log(spark, rows)).collect()
    s1 = fold_error_slice(None, _log(spark, [r for r in rows if r[2] < 4]))
    two = fold_error_slice(s1, _log(spark, [r for r in rows if r[2] >= 4]))
    # pages untouched by slice 2 keep their slice-1 rows (the caller's MERGE)
    merged = two.unionByName(
        s1.join(two.select("fingerprint"), "fingerprint", "left_anti")
    ).collect()
    key = lambda r: r.fingerprint
    assert sorted(map(tuple, full), key=lambda t: t[0]) == sorted(
        map(tuple, merged), key=lambda t: t[0]
    )
    byfp = {r.fingerprint: r for r in full}
    assert (byfp[1].n_errors, byfp[1].last_it) == (3, 7)
    assert (byfp[2].n_errors, byfp[2].last_it) == (1, 2)
    assert (byfp[3].n_errors, byfp[3].last_it) == (2, 6)


def test_retry_schedule_matches_python_oracle(spark):
    """Due math and the give_up boundary, vs a literal Python model."""
    state = spark.createDataFrame(
        [(i, 0, n, 10) for i, n in enumerate([1, 2, 3, 4, 20], start=1)],
        "fingerprint long, partition_id int, n_errors long, last_it long",
    )
    got = {
        r.fingerprint: r
        for r in retry_schedule(
            state, max_retries=3, base_interval_s=2, max_backoff_exp=4
        ).collect()
    }
    for fp, n in [(1, 1), (2, 2), (3, 3), (4, 4), (5, 20)]:
        if n <= 3:
            exp_due = (10 + 2 * 2 ** min(n - 1, 4)) * US
            assert got[fp].action == "retry" and got[fp].due_us == exp_due
        else:
            assert got[fp].action == "give_up" and got[fp].due_us is None
    # exponent cap: n=20 would be 2^19 without the cap
    assert got[5].action == "give_up"


def test_requeue_due_from_state_error(spark, tmp_path):
    """from_state=STATE_ERROR touches ERROR rows only; CRAWLED and QUEUED
    rows are never flipped by a retry requeue."""
    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=2, strategy="bfs")
    urls = [f"https://h{i}.example.test/p" for i in range(3)]
    eng.add_seeds(
        spark.createDataFrame(list(enumerate(urls)), "seq int, url string").select(
            "url", "seq"
        )
    )
    rows = {r.canonical_url: r for r in eng.table.read().collect()}
    eng.request_error(
        eng.table.read()
        .filter(F.col("canonical_url") == urls[0])
        .select("fingerprint", "partition_id")
    )
    eng.page_crawled(
        eng.table.read()
        .filter(F.col("canonical_url") == urls[1])
        .select("fingerprint", "partition_id")
    )
    due = spark.createDataFrame(
        [
            (rows[u].fingerprint, rows[u].partition_id, 5 * US)
            for u in urls  # offered for ALL three; only the ERROR row moves
        ],
        "fingerprint long, partition_id int, due_us long",
    ).select("fingerprint", "partition_id", F.timestamp_micros("due_us").alias("crawl_at"))
    assert eng.requeue_due(due, from_state=STATE_ERROR) == 1
    after = {r.canonical_url: r for r in eng.table.read().collect()}
    assert after[urls[0]].state == STATE_QUEUED
    assert int(pd.Timestamp(after[urls[0]].crawl_at).value // 1_000) == 5 * US
    assert after[urls[1]].state == STATE_CRAWLED
    assert after[urls[2]].state == STATE_QUEUED and after[urls[2]].crawl_at is None


@pytest.fixture(scope="module")
def retry_corpus(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("retrycorpus") / "c")
    write_corpus(spark, path, 12, 3, 11)
    return path


def test_loop_flaky_host_retries_to_success(spark, tmp_path, retry_corpus):
    """A flaky host's pages fail their first 2 attempts, then succeed: with
    the retry policy every corpus page still ends CRAWLED, and the retry
    state records exactly 2 errors for the flaky pages."""
    loop = CrawlLoop(
        spark,
        str(tmp_path / "eng"),
        retry_corpus,
        corpus_seed=11,
        strategy="bfs",
        batch_size=8,
        n_partitions=2,
        retry={"max_retries": 3, "base_interval_s": 1, "every": 1},
        flaky_hosts={"h000.example.test": 2},
    )
    loop.add_seeds([url_of(0, 3)])
    hist = loop.run(max_iterations=60)
    assert sum(m.get("invariant_violations", 0) for m in hist) == 0
    assert sum(m.get("n_errors", 0) for m in hist) > 0  # failures happened
    frontier = loop.engine.table.read().collect()
    # reachable = whole 12-page tree from seed 0
    assert len(frontier) == 12
    assert all(r.state == STATE_CRAWLED for r in frontier), [
        (r.canonical_url, r.state) for r in frontier if r.state != STATE_CRAWLED
    ]
    st = {r.fingerprint: r for r in loop._retry_state_table().read().collect()}
    flaky_fps = {
        r.fingerprint for r in frontier if r.host == "h000.example.test"
    }
    assert flaky_fps and all(st[fp].n_errors == 2 for fp in flaky_fps)
    # non-flaky pages never errored: no state rows beyond the flaky set
    assert set(st) == flaky_fps


def test_loop_gives_up_after_max_retries(spark, tmp_path, retry_corpus):
    """A permanently-404 URL (no corpus entry) is retried max_retries times
    and then stays ERROR — and the crawl still terminates."""
    loop = CrawlLoop(
        spark,
        str(tmp_path / "eng"),
        retry_corpus,
        corpus_seed=11,
        strategy="bfs",
        batch_size=8,
        n_partitions=2,
        retry={"max_retries": 2, "base_interval_s": 1, "every": 1},
    )
    dead = url_of(50, 3)  # idx 50 not in the 12-image corpus
    loop.add_seeds([url_of(0, 3), dead])
    loop.run(max_iterations=60)
    rows = {r.canonical_url: r for r in loop.engine.table.read().collect()}
    assert rows[dead].state == STATE_ERROR
    st = {r.fingerprint: r for r in loop._retry_state_table().read().collect()}
    # attempts: initial + 2 retries = 3 recorded errors (max_retries + 1)
    assert st[rows[dead].fingerprint].n_errors == 3
    # everything else crawled
    assert all(r.state == STATE_CRAWLED for u, r in rows.items() if u != dead)


def test_loop_flaky_without_retry_stays_error(spark, tmp_path, retry_corpus):
    """flaky_hosts without a retry policy: failed pages are terminal ERROR
    (the pre-retry engine behavior, unchanged)."""
    loop = CrawlLoop(
        spark,
        str(tmp_path / "eng"),
        retry_corpus,
        corpus_seed=11,
        strategy="bfs",
        batch_size=8,
        n_partitions=2,
        flaky_hosts={"h000.example.test": 1},
    )
    loop.add_seeds([url_of(0, 3)])
    loop.run(max_iterations=30)
    frontier = loop.engine.table.read().collect()
    states = {r.canonical_url: r.state for r in frontier}
    flaky = [u for u, _ in states.items() if u.startswith("https://h000.")]
    assert flaky and all(states[u] == STATE_ERROR for u in flaky)
    assert all(
        s == STATE_CRAWLED for u, s in states.items() if not u.startswith("https://h000.")
    )
