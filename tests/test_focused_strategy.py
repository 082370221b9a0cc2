"""Focused (topic-directed) crawling — shark-search link pricing on the
cash-ordered frontier (core/strategies.FocusedStrategy; Hersovici et al.
WWW8 '98). Sequence parity vs the single-threaded oracle, relevance-
expression parity Spark↔Python, steering behavior (relevant subtree first),
and a CrawlLoop e2e whose Spark-side pricing (parent_cash_frame/link_cash
over fetched captions) must reproduce the oracle's per-batch pops.

Dyadic decay/gamma and 4-token queries keep every cash value an exact
binary fraction, so float sums are order-independent and engine/oracle
compare bit-exactly (the OPIC-test trick)."""

import pytest
from pyspark.sql import functions as F

from frontera_spark import STATE_CRAWLED
from frontera_spark.core.frontier import FrontierEngine
from frontera_spark.core.oracle import OracleFrontier, crawl_sequence
from frontera_spark.core.strategies import (
    STRATEGIES,
    FocusedStrategy,
    query_tokens,
    relevance_py,
)
from frontera_spark.core.tester import run_crawl
from frontera_spark.sources.corpus import url_of, write_corpus
from frontera_spark.streaming.loop import CrawlLoop

H1, H2 = "https://rel.example.test", "https://irr.example.test"
Q = "deep blue ocean wave"  # 4 tokens -> rel in {0, 1/4, 1/2, 3/4, 1}

# /root links to a topically RELEVANT page and an IRRELEVANT one at the same
# depth; each has two children. BFS would interleave the grandchildren;
# focused must fund /rel's children harder and fetch them first.
G_STEER = {
    f"{H1}/root": [f"{H1}/rel", f"{H2}/irr"],
    f"{H1}/rel": [f"{H1}/rel/a", f"{H1}/rel/b"],
    f"{H2}/irr": [f"{H2}/irr/a", f"{H2}/irr/b"],
    f"{H1}/rel/a": [f"{H1}/rel/a/x"],
}
T_STEER = {
    f"{H1}/root": "portal page",
    f"{H1}/rel": "the deep blue ocean wave rolls",  # rel = 1.0
    f"{H2}/irr": "tax form archive",  # rel = 0.0
    f"{H1}/rel/a": "another ocean wave photo",  # rel = 1/2
    f"{H2}/irr/a": "",
}

G_CYCLE = {
    f"{H1}/A": [f"{H1}/B"],
    f"{H1}/B": [f"{H1}/C", f"{H1}/A"],
    f"{H1}/C": [f"{H1}/A"],
}
T_CYCLE = {f"{H1}/A": "blue wave", f"{H1}/B": "ocean", f"{H1}/C": ""}


def _strategy():
    return FocusedStrategy(query=Q, decay=0.5, gamma=0.5)


def _oracle_cfg(texts):
    return {"query": Q, "decay": 0.5, "gamma": 0.5, "texts": texts}


def test_validation_and_registry_shape(spark):
    with pytest.raises(ValueError):
        FocusedStrategy(query="  --  ")
    s = _strategy()
    assert s.accumulates_cash
    assert query_tokens(Q) == ["blue", "deep", "ocean", "wave"]
    # ordering is cash desc, seq asc (inherited from the OPIC surface)
    df = spark.createDataFrame([(0.25, 1), (0.75, 2)], "score double, seq long")
    assert [r.seq for r in df.orderBy(*s.ordering()).collect()] == [2, 1]
    assert not STRATEGIES["bfs"].accumulates_cash


def test_relevance_expr_matches_python(spark):
    s = _strategy()
    texts = [
        "the deep blue ocean wave rolls",
        "Deep-Blue OCEAN!",
        "no match here",
        "wave wave wave",
        "",
        "deep deep blue blue ocean ocean wave wave extra",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.rel for r in df.select(s.relevance(F.col("text")).alias("rel")).collect()]
    exp = [relevance_py(t, query_tokens(Q)) for t in texts]
    assert got == exp
    assert exp[0] == 1.0 and exp[1] == 0.75 and exp[2] == 0.0 and exp[3] == 0.25


@pytest.mark.parametrize(
    "graph,texts,seeds,k",
    [
        (G_STEER, T_STEER, [f"{H1}/root"], 1),
        (G_STEER, T_STEER, [f"{H1}/root"], 2),
        (G_STEER, T_STEER, [f"{H1}/root"], 64),
        (G_CYCLE, T_CYCLE, [f"{H1}/A"], 1),
    ],
)
def test_focused_sequence_matches_oracle(spark, tmp_path, graph, texts, seeds, k):
    exp_order, exp_states = crawl_sequence(
        graph, seeds, "focused", k, focused=_oracle_cfg(texts)
    )
    eng = FrontierEngine(
        spark,
        str(tmp_path / f"foc{k}_{len(graph)}"),
        n_partitions=1,
        strategy=_strategy(),
    )
    got_order, got_states = run_crawl(eng, graph, seeds, k, page_texts=texts)
    assert got_order == exp_order, f"focused k={k}"
    assert got_states == exp_states


def test_focused_steers_to_relevant_subtree(spark, tmp_path):
    """Children of the relevant parent outrank children of the irrelevant
    parent (0.5*(0.5*1.0+0.5*cash) > 0.5*(0.5*0.0+0.5*cash)) — the defining
    focused-crawl behavior BFS cannot express."""
    order, _ = crawl_sequence(
        G_STEER, [f"{H1}/root"], "focused", 1, focused=_oracle_cfg(T_STEER)
    )
    for rel_child in (f"{H1}/rel/a", f"{H1}/rel/b"):
        for irr_child in (f"{H2}/irr/a", f"{H2}/irr/b"):
            assert order.index(rel_child) < order.index(irr_child)
    eng = FrontierEngine(
        spark, str(tmp_path / "steer"), n_partitions=1, strategy=_strategy()
    )
    got, _ = run_crawl(eng, G_STEER, [f"{H1}/root"], 1, page_texts=T_STEER)
    assert got == order


N_IMAGES, N_HOSTS, SEED = 40, 7, 99
Q_CORPUS = "lighthouse drifting lantern dusk"  # 4 caption-vocabulary tokens


def test_crawl_loop_focused_matches_oracle_batches(spark, tmp_path):
    """CrawlLoop e2e: the LIVE Spark pricing path (parent_cash_frame joins
    fetched captions with pop-time scores, link_cash full-strength) must
    reproduce the oracle's per-batch pop sets over a real corpus crawl."""
    corpus_path = str(tmp_path / "corpus")
    write_corpus(spark, corpus_path, N_IMAGES, N_HOSTS, SEED)
    rows = spark.read.parquet(corpus_path).select("url", "out_links", "caption").collect()
    graph = {r.url: list(r.out_links) for r in rows}
    texts = {r.url: r.caption for r in rows}

    seeds = [url_of(0, N_HOSTS)]
    loop = CrawlLoop(
        spark,
        str(tmp_path / "eng"),
        corpus_path,
        corpus_seed=SEED,
        strategy_obj=_strategy(),
        batch_size=8,
        n_partitions=1,
        mode="global",
    )
    loop.add_seeds(seeds)
    hist = loop.run()
    assert sum(m["invariant_violations"] for m in hist) == 0

    # oracle batches under the same batch size
    f = OracleFrontier(strategy="focused", focused=_oracle_cfg(texts))
    f.add_seeds(seeds)
    exp_batches = []
    while True:
        batch = f.get_next_requests(8)
        if not batch:
            break
        exp_batches.append(batch)
        for url in batch:
            f.page_crawled(url)
        for url in batch:
            f.links_extracted(url, graph.get(url, []))

    got = (
        loop.engine.table.read()
        .filter(F.col("state") == STATE_CRAWLED)
        .select("batch_id", "canonical_url")
        .collect()
    )
    got_batches: dict[int, set] = {}
    for r in got:
        got_batches.setdefault(r.batch_id, set()).add(r.canonical_url)
    assert len(got_batches) == len(exp_batches)
    for i, bid in enumerate(sorted(got_batches)):
        assert got_batches[bid] == set(exp_batches[i]), f"batch {i}"
    assert sum(m["n_fetched"] for m in hist) == sum(len(b) for b in exp_batches)


def test_focused_cash_accumulates_over_parents(spark, tmp_path):
    """Two parents funding one child sum their priced cash (additive MERGE),
    and the pricing ignores out-degree (full-strength inheritance)."""
    eng = FrontierEngine(
        spark, str(tmp_path / "accum"), n_partitions=1, strategy=_strategy()
    )
    links = spark.createDataFrame(
        [
            (f"{H1}/y", 1, 0, 1, 0.375),
            (f"{H1}/y", 2, 0, 1, 0.25),
        ],
        "url string, parent_seq long, link_pos int, depth int, _cash double",
    )
    eng.links_extracted(links)
    row = eng.table.read().collect()[0]
    assert row.score == 0.375 + 0.25
