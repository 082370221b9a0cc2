"""Politeness parity (SURVEY.md M5): token buckets, budgets, robots-at-pop —
Spark PoliteScheduler vs the single-threaded oracle, plus budget-respect and
carry-over unit checks (FIXTURES.md §4)."""

import pytest
from pyspark.sql import functions as F

from frontera_spark import STATE_CRAWLED, STATE_QUEUED, STATE_SKIPPED_ROBOTS
from frontera_spark.core.oracle import crawl_sequence
from frontera_spark.sources.corpus import url_of, write_corpus
from frontera_spark.streaming.loop import CrawlLoop

N_IMAGES, N_HOSTS, SEED = 40, 7, 42
POLICY_SCHEMA = "host string, robots_allow boolean, delay_s double, budget long"


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pol_corpus") / "corpus")
    write_corpus(spark, path, N_IMAGES, N_HOSTS, SEED)
    return path


def corpus_graph(spark, corpus_path):
    rows = spark.read.parquet(corpus_path).select("url", "out_links").collect()
    return {r.url: list(r.out_links) for r in rows}


def make_loop(spark, workdir, corpus_path, policies, **kw):
    pol_df = spark.createDataFrame(policies, POLICY_SCHEMA)
    kw.setdefault("strategy", "bfs")
    kw.setdefault("batch_size", 16)
    kw.setdefault("n_partitions", 1)
    kw.setdefault("mode", "global")
    kw.setdefault("check_invariant", False)  # payload checked in loop tests
    return CrawlLoop(
        spark, workdir, corpus_path, corpus_seed=SEED, politeness=pol_df, **kw
    )


def oracle_politeness(policies):
    return {
        h: {"robots_allow": allow, "delay_s": delay, "budget": budget}
        for (h, allow, delay, budget) in policies
    }


def run_both(spark, tmp_path, corpus_path, policies, strategy="bfs", batch=16):
    loop = make_loop(
        spark, str(tmp_path / "eng"), corpus_path, policies, strategy=strategy, batch_size=batch
    )
    seeds = [url_of(0, N_HOSTS)]
    loop.add_seeds(seeds)
    hist = loop.run(max_iterations=200)

    graph = corpus_graph(spark, corpus_path)
    exp_order, exp_states = crawl_sequence(
        graph, seeds, strategy, batch, politeness=oracle_politeness(policies)
    )
    got_states = {
        r.canonical_url: r.state
        for r in loop.engine.table.read().select("canonical_url", "state").collect()
    }
    return loop, hist, exp_order, exp_states, got_states


def test_throttled_host_parity(spark, tmp_path, corpus_path):
    """Hot host h000 throttled to ~1 fetch/tick: batches can't drain it; its
    URLs carry over while other hosts are served — seen set + per-iteration
    counts must match the oracle exactly."""
    policies = [("h000.example.test", True, 1.0, None)]
    loop, hist, exp_order, exp_states, got_states = run_both(
        spark, tmp_path, corpus_path, policies
    )
    assert sum(m["n_fetched"] for m in hist) == len(exp_order)
    assert got_states == exp_states
    # crawl took MORE iterations than the unthrottled ~N/batch bound
    assert len(hist) > N_IMAGES // 16 + 1


def test_budget_exhaustion(spark, tmp_path, corpus_path):
    """Host budget=2: exactly 2 of its pages are ever fetched; the rest stay
    QUEUED and the loop still terminates (has_pending → False)."""
    host = "h000.example.test"
    policies = [(host, True, None, 2)]
    loop, hist, exp_order, exp_states, got_states = run_both(
        spark, tmp_path, corpus_path, policies
    )
    assert got_states == exp_states
    crawled_host = [
        r
        for r in loop.engine.table.read()
        .filter((F.col("host") == host) & (F.col("state") == STATE_CRAWLED))
        .collect()
    ]
    assert len(crawled_host) == 2
    leftover = (
        loop.engine.table.read()
        .filter((F.col("host") == host) & (F.col("state") == STATE_QUEUED))
        .count()
    )
    assert leftover > 0


def test_robots_denied_at_pop(spark, tmp_path, corpus_path):
    """robots_allow=false host: its queued URLs become SKIPPED_ROBOTS during
    the scheduler walk and are never fetched."""
    host = "h001.example.test"
    policies = [(host, False, None, None)]
    loop, hist, exp_order, exp_states, got_states = run_both(
        spark, tmp_path, corpus_path, policies
    )
    assert got_states == exp_states
    tbl = loop.engine.table.read()
    assert tbl.filter((F.col("host") == host) & (F.col("state") == STATE_CRAWLED)).count() == 0
    assert (
        tbl.filter((F.col("host") == host) & (F.col("state") == STATE_SKIPPED_ROBOTS)).count()
        > 0
    )


def test_throttled_host_parity_dfs(spark, tmp_path, corpus_path):
    """Same parity under the DFS ordering (throttle interacts with the
    depth-desc heap differently than BFS)."""
    policies = [("h000.example.test", True, 1.0, None)]
    loop, hist, exp_order, exp_states, got_states = run_both(
        spark, tmp_path, corpus_path, policies, strategy="dfs", batch=8
    )
    assert sum(m["n_fetched"] for m in hist) == len(exp_order)
    assert got_states == exp_states


def test_budget_respected_in_per_partition_mode(spark, tmp_path, corpus_path):
    """Cluster-scale mode: each partition schedules independently, but a
    host's budget still binds exactly (a host lives in one partition). WHICH
    rows are chosen may differ from the single-consumer oracle; the cap and
    the totals may not."""
    host = "h000.example.test"
    policies = [(host, True, None, 3)]
    loop = make_loop(
        spark,
        str(tmp_path / "eng"),
        corpus_path,
        policies,
        n_partitions=4,
        mode="per_partition",
    )
    loop.add_seeds([url_of(0, N_HOSTS)])
    loop.run(max_iterations=100)
    tbl = loop.engine.table.read()
    assert (
        tbl.filter((F.col("host") == host) & (F.col("state") == STATE_CRAWLED)).count() == 3
    )
    # every other host fully crawled
    others = tbl.filter(F.col("host") != host)
    assert others.filter(F.col("state") != STATE_CRAWLED).count() == 0


def test_politeness_resume(spark, tmp_path, corpus_path):
    """Politeness state (tokens, fetched) survives restart: interrupted+resumed
    run ends with the same states as an uninterrupted one."""
    policies = [("h000.example.test", True, 1.0, None)]
    seeds = [url_of(0, N_HOSTS)]

    ref = make_loop(spark, str(tmp_path / "ref"), corpus_path, policies)
    ref.add_seeds(seeds)
    ref.run(max_iterations=200)
    ref_states = {
        (r.canonical_url, r.state)
        for r in ref.engine.table.read().select("canonical_url", "state").collect()
    }

    part = make_loop(spark, str(tmp_path / "part"), corpus_path, policies)
    part.add_seeds(seeds)
    part.run(max_iterations=3)
    resumed = make_loop(spark, str(tmp_path / "part"), corpus_path, policies)
    resumed.run(max_iterations=200)
    got = {
        (r.canonical_url, r.state)
        for r in resumed.engine.table.read().select("canonical_url", "state").collect()
    }
    assert got == ref_states
