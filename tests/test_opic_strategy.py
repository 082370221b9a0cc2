"""OPIC as a live crawl strategy (VERDICT r4 missing #3): cash-ledger
scoring on the frontier, additive-cash MERGE (SnapshotTable add_cols), and
exact sequence parity vs the single-threaded oracle's greedy
highest-cash-first model (Abiteboul, Preda & Cobena, WWW'03; frontera's
``BaseCrawlingStrategy.schedule(request, score)`` online-prioritizer
surface, frontera/strategy/__init__.py:~100-120).

Graphs use dyadic out-degrees (1/2/4) so every cash share is an exact
binary fraction — float sums are then order-independent and engine/oracle
orders compare bit-exactly, not just approximately.
"""

import pytest
from pyspark.sql import functions as F

from frontera_spark import STATE_CRAWLED, STATE_QUEUED
from frontera_spark.core.frontier import FrontierEngine
from frontera_spark.core.oracle import crawl_sequence
from frontera_spark.core.strategies import STRATEGIES, OpicStrategy
from frontera_spark.core.tester import run_crawl
from frontera_spark.plans.snapshot import SnapshotTable

H1, H2 = "https://a.example.test", "https://b.example.test"

# /c is a hub fed by both /a and /b: its cash (0.25 + 0.5) overtakes /d's
# single 0.25 share, so OPIC must fetch /c before /d while BFS would tie
# them on depth. All out-degrees are 1, 2 or 4 (dyadic — see module doc).
G_HUB = {
    f"{H1}/root": [f"{H1}/a", f"{H2}/b"],
    f"{H1}/a": [f"{H1}/c", f"{H1}/d"],
    f"{H2}/b": [f"{H1}/c"],
    f"{H1}/c": [f"{H1}/root", f"{H1}/d", f"{H2}/e", f"{H2}/f"],
    f"{H1}/d": [f"{H2}/e"],
}
G_CYCLE = {
    f"{H1}/A": [f"{H1}/B"],
    f"{H1}/B": [f"{H1}/C"],
    f"{H1}/C": [f"{H1}/A"],
}


def _engine(spark, tmp_path, tag, **kw):
    return FrontierEngine(
        spark, str(tmp_path / f"opic_{tag}"), n_partitions=1, strategy="opic", **kw
    )


@pytest.mark.parametrize("graph,seeds,k", [
    (G_HUB, [f"{H1}/root"], 1),
    (G_HUB, [f"{H1}/root"], 2),
    (G_HUB, [f"{H1}/root"], 64),
    (G_CYCLE, [f"{H1}/A"], 1),
])
def test_opic_sequence_matches_oracle(spark, tmp_path, graph, seeds, k):
    exp_order, exp_states = crawl_sequence(graph, seeds, "opic", k)
    eng = _engine(spark, tmp_path, f"seq{k}_{len(graph)}")
    got_order, got_states = run_crawl(eng, graph, seeds, k)
    assert got_order == exp_order, f"opic k={k}"
    assert got_states == exp_states


def test_opic_hub_beats_leaf(spark, tmp_path):
    """The doubly-funded hub /c outranks the singly-funded /d — the defining
    OPIC behavior a depth strategy cannot express."""
    order, _ = crawl_sequence(G_HUB, [f"{H1}/root"], "opic", 1)
    assert order.index(f"{H1}/c") < order.index(f"{H1}/d")
    eng = _engine(spark, tmp_path, "hub")
    got, _ = run_crawl(eng, G_HUB, [f"{H1}/root"], 1)
    assert got.index(f"{H1}/c") < got.index(f"{H1}/d")


def test_opic_cash_accumulates_on_queued_rows(spark, tmp_path):
    """A re-offered known link ADDS cash to the queued row's score (the
    add_cols merge), instead of being dropped whole by the dedup anti-join."""
    eng = _engine(spark, tmp_path, "accum")
    eng.add_seeds(spark.createDataFrame([(f"{H1}/x", 0)], "url string, seq int"))

    def offer(cash):
        links = spark.createDataFrame(
            [(f"{H1}/x", 100, 0, 1, cash)],
            "url string, parent_seq long, link_pos int, depth int, _cash double",
        )
        eng.links_extracted(links)

    offer(0.5)
    offer(0.25)
    row = eng.table.read().filter(F.col("canonical_url") == f"{H1}/x").collect()[0]
    assert row.state == STATE_QUEUED
    assert row.score == 1.0 + 0.5 + 0.25  # seed cash + two accruals, exact


def test_opic_seed_cash_and_insert_sum(spark, tmp_path):
    """Fresh children discovered twice in ONE batch insert with SUMMED cash
    (two parents funding the same new page)."""
    eng = _engine(spark, tmp_path, "insert_sum")
    links = spark.createDataFrame(
        [
            (f"{H1}/y", 1, 0, 1, 0.5),
            (f"{H1}/y", 2, 0, 1, 0.25),
        ],
        "url string, parent_seq long, link_pos int, depth int, _cash double",
    )
    eng.links_extracted(links)
    row = eng.table.read().collect()[0]
    assert row.score == 0.75


def test_strategy_registry_and_order_columns(spark):
    s = STRATEGIES["opic"]
    assert isinstance(s, OpicStrategy) and s.accumulates_cash
    assert not STRATEGIES["bfs"].accumulates_cash
    # ordering is (score desc, seq asc); pandas_order keys are integral
    df = spark.createDataFrame(
        [(0.5, 1), (0.75, 2), (0.5, 0)], "score double, seq long"
    )
    got = [r.seq for r in df.orderBy(*s.ordering()).collect()]
    assert got == [2, 0, 1]
    k1, k2 = s.pandas_order()
    got_pd = [r.seq for r in df.orderBy(k1.asc(), k2.asc()).collect()]
    assert got_pd == [2, 0, 1]


SCHEMA = "fingerprint long, url string, state int, score double, partition_id int"


def test_snapshot_add_cols_merge(spark, tmp_path):
    """Table-layer accumulator merge: add_cols sums on match, inserts pass
    through, and NULL source values (state OR score) leave the target value
    alone — the heterogeneous-update contract the OPIC ledger rides on."""
    t = SnapshotTable.create(spark, str(tmp_path / "acc"), SCHEMA, key=["fingerprint"])
    t.upsert(spark.createDataFrame([(1, "a", 1, 0.5, 0), (2, "b", 1, 1.0, 0)], SCHEMA))
    src = spark.createDataFrame(
        [
            (1, None, None, 0.25, 0),  # cash only: state must survive
            (2, None, 2, None, 0),  # state only: score must survive
            (3, "c", 1, 0.125, 0),  # fresh insert
        ],
        SCHEMA,
    )
    t.upsert(src, set_cols=["state"], add_cols=["score"])
    got = {r.fingerprint: r for r in t.read().collect()}
    assert got[1].score == 0.75 and got[1].state == 1 and got[1].url == "a"
    assert got[2].score == 1.0 and got[2].state == 2
    assert got[3].score == 0.125


def test_opic_crawl_loop_e2e(spark, tmp_path, tmp_path_factory):
    """CrawlLoop with strategy='opic': batch=1 order matches the oracle
    exactly (sequential cash accrual is bit-deterministic), and a batch=8
    run still converges to the identical final seen set."""
    from frontera_spark.sources.corpus import url_of, write_corpus
    from frontera_spark.streaming.loop import CrawlLoop

    corpus_path = str(tmp_path_factory.mktemp("opic_corpus") / "corpus")
    write_corpus(spark, corpus_path, 24, 5, 7)
    graph = {
        r.url: list(r.out_links)
        for r in spark.read.parquet(corpus_path).select("url", "out_links").collect()
    }
    seeds = [url_of(0, 5)]
    exp_order, exp_states = crawl_sequence(graph, seeds, "opic", 1)

    loop = CrawlLoop(
        spark, str(tmp_path / "loop1"), corpus_path, corpus_seed=7,
        strategy="opic", batch_size=1, n_partitions=1, mode="global",
    )
    loop.add_seeds(seeds)
    hist = loop.run()
    assert sum(m["invariant_violations"] for m in hist) == 0
    eng = loop.engine
    rows = (
        eng.table.read()
        .filter(F.col("state") == STATE_CRAWLED)
        .orderBy(F.col("batch_id").asc())
        .select("canonical_url")
        .collect()
    )
    assert [r.canonical_url for r in rows] == exp_order

    loop8 = CrawlLoop(
        spark, str(tmp_path / "loop8"), corpus_path, corpus_seed=7,
        strategy="opic", batch_size=8, n_partitions=2, mode="per_partition",
    )
    loop8.add_seeds(seeds)
    loop8.run()
    _, exp_states8 = crawl_sequence(graph, seeds, "opic", 8)
    got_states = {
        r.canonical_url: r.state
        for r in loop8.engine.table.read().select("canonical_url", "state").collect()
    }
    assert set(got_states) == set(exp_states8)
    assert all(v == STATE_CRAWLED for v in got_states.values())
