"""Sequence parity: Spark engine order == single-threaded oracle order
(SURVEY.md §5.1 — the reference's golden-sequence tests, tests/backends.py).

Engine runs in single-partition "sequence mode" (n_partitions=1,
mode='global') to reproduce the reference's single-consumer total order;
multi-partition runs assert exact final seen-set equality instead
(SURVEY.md §7.4.1).
"""

import pytest

from frontera_spark.core.frontier import FrontierEngine
from frontera_spark.core.oracle import QUEUED, SKIPPED_ROBOTS, crawl_sequence
from frontera_spark.core.tester import run_crawl

H1, H2, H3 = "https://a.example.test", "https://b.example.test", "https://c.example.test"

G_2LEVEL = {
    f"{H1}/root": [f"{H1}/a1", f"{H2}/a2"],
    f"{H1}/a1": [f"{H1}/a11", f"{H1}/a12"],
    f"{H2}/a2": [f"{H2}/a21", f"{H2}/a22"],
}
G_DIAMOND = {
    f"{H1}/A": [f"{H1}/B", f"{H1}/C"],
    f"{H1}/B": [f"{H1}/D"],
    f"{H1}/C": [f"{H1}/D"],
}
G_CYCLE = {
    f"{H1}/A": [f"{H1}/B"],
    f"{H1}/B": [f"{H1}/C"],
    f"{H1}/C": [f"{H1}/A"],
}
G_MULTIHOST = {
    f"{h}/p{i}": ([f"{h}/p{i+1}"] if i < 4 else [f"{other}/p0"])
    for h, other in [(H1, H2), (H2, H3), (H3, H1)]
    for i in range(5)
}


def _engine(spark, tmp_path, strategy, n_partitions=1, **kw):
    return FrontierEngine(
        spark, str(tmp_path / f"eng_{strategy}"), n_partitions=n_partitions,
        strategy=strategy, **kw,
    )


SEQ_CASES = [
    ("bfs", G_2LEVEL, [f"{H1}/root"], 2),
    ("dfs", G_2LEVEL, [f"{H1}/root"], 2),
    ("fifo", G_2LEVEL, [f"{H1}/root"], 64),
    ("lifo", G_2LEVEL, [f"{H1}/root"], 1),
    ("bfs", G_DIAMOND, [f"{H1}/A"], 64),
    ("bfs", G_CYCLE, [f"{H1}/A"], 1),
    ("dfs", G_MULTIHOST, [f"{H1}/p0", f"{H2}/p0"], 3),
]


@pytest.mark.parametrize("strategy,graph,seeds,k", SEQ_CASES)
def test_sequence_matches_oracle(spark, tmp_path, strategy, graph, seeds, k):
    exp_order, exp_states = crawl_sequence(graph, seeds, strategy, k)
    eng = _engine(spark, tmp_path, strategy)
    got_order, got_states = run_crawl(eng, graph, seeds, k)
    assert got_order == exp_order, f"{strategy} k={k}"
    assert got_states == exp_states


def test_dedup_diamond(spark, tmp_path):
    """D is fetched exactly once despite two in-links (J2 anti-join)."""
    eng = _engine(spark, tmp_path, "bfs")
    order, _ = run_crawl(eng, G_DIAMOND, [f"{H1}/A"], 64)
    assert order.count(f"{H1}/D") == 1
    assert len(order) == len(set(order)) == 4


def test_cycle_terminates(spark, tmp_path):
    eng = _engine(spark, tmp_path, "bfs")
    order, _ = run_crawl(eng, G_CYCLE, [f"{H1}/A"], 2, max_iterations=20)
    assert len(order) == 3


def test_multipartition_seen_set_parity(spark, tmp_path):
    """P>1: total order may differ, final seen set must be identical."""
    _, exp_states = crawl_sequence(G_MULTIHOST, [f"{H1}/p0"], "bfs", 2)
    eng = _engine(spark, tmp_path, "bfs", n_partitions=4)
    _, got_states = run_crawl(eng, G_MULTIHOST, [f"{H1}/p0"], 2, mode="per_partition")
    assert got_states == exp_states


def test_max_per_host_cap(spark, tmp_path):
    """A2 batch shaping: per-host cap matches oracle pop-with-skip."""
    exp_order, _ = crawl_sequence(
        G_MULTIHOST, [f"{H1}/p0", f"{H2}/p0", f"{H3}/p0"], "fifo", 4, max_per_host=1
    )
    eng = _engine(spark, tmp_path, "fifo")
    got_order, _ = run_crawl(
        eng, G_MULTIHOST, [f"{H1}/p0", f"{H2}/p0", f"{H3}/p0"], 4, max_per_host=1
    )
    assert got_order == exp_order


def test_robots_gate(spark, tmp_path):
    """Robots-denied host: URLs recorded as SKIPPED_ROBOTS, never fetched."""
    deny = frozenset(["b.example.test"])
    exp_order, exp_states = crawl_sequence(
        G_2LEVEL, [f"{H1}/root"], "bfs", 64, robots_deny_hosts=deny
    )
    eng = _engine(spark, tmp_path, "bfs", robots_deny_hosts=deny)
    got_order, got_states = run_crawl(eng, G_2LEVEL, [f"{H1}/root"], 64)
    assert got_order == exp_order
    assert got_states == exp_states
    assert got_states[f"{H2}/a2"] == SKIPPED_ROBOTS
    assert f"{H2}/a2" not in got_order


def test_max_depth_guard(spark, tmp_path):
    exp_order, exp_states = crawl_sequence(G_CYCLE, [f"{H1}/A"], "bfs", 64, max_depth=1)
    eng = _engine(spark, tmp_path, "bfs", max_depth=1)
    got_order, got_states = run_crawl(eng, G_CYCLE, [f"{H1}/A"], 64)
    assert got_order == exp_order == [f"{H1}/A", f"{H1}/B"]
    assert got_states == exp_states


def test_seed_file_order_parity(spark, tmp_path):
    """Bulk file load: seq order == file line order, with no global-window
    numbering (frontier seq must equal the oracle's discovery order even when
    the text scan splits across partitions)."""
    urls = [f"https://h{i % 5}.example.test/p/{i:05d}" for i in (3, 1, 4, 1, 5, 9, 2, 6, 8, 7)]
    urls = [u for i, u in enumerate(urls) if urls.index(u) == i]  # drop in-file dup
    path = tmp_path / "seeds.txt"
    path.write_text("\n".join([urls[0], "", *urls[1:]]) + "\n")  # blank line ignored
    eng = _engine(spark, tmp_path, "fifo")
    n = eng.add_seeds_file(str(path))
    assert n == len(urls)
    got = [
        r.canonical_url
        for r in eng.table.read().orderBy("seq").select("canonical_url").collect()
    ]
    assert got == urls
    # idempotent re-load
    assert eng.add_seeds_file(str(path)) == 0


def test_bulk_range_path_order_and_dedup(spark, tmp_path, monkeypatch):
    """Above BULK_SORT_ROWS, _finalize range-partitions for seq assignment
    and gates on the FRESH count: a fresh bulk load keeps exact discovery
    order, a 100%-duplicate bulk re-offer exits before the range machinery,
    and a mixed re-offer numbers only the survivors — all identical to the
    small-batch path's semantics."""
    monkeypatch.setattr(FrontierEngine, "BULK_SORT_ROWS", 8)
    eng = _engine(spark, tmp_path, "fifo")
    urls = [f"https://h{i % 3}.example.test/bulk/{i:04d}" for i in range(40)]
    seeds = spark.createDataFrame(
        [(u, i) for i, u in enumerate(urls)], "url string, seq int"
    )
    assert eng.add_seeds(seeds) == 40
    got = [
        r.canonical_url
        for r in eng.table.read().orderBy("seq").select("canonical_url").collect()
    ]
    assert got == urls  # file order == seq order through the range path
    # all-duplicate bulk re-offer: fresh-count gate exits with zero inserts
    sid0 = eng.table.snapshot_id
    assert eng.add_seeds(seeds) == 0
    assert eng.table.snapshot_id == sid0, "no commit on an all-dup re-offer"
    # mixed bulk: only survivors numbered, densely, after the existing max
    urls2 = urls[:20] + [f"https://h9.example.test/new/{i}" for i in range(20)]
    seeds2 = spark.createDataFrame(
        [(u, i) for i, u in enumerate(urls2)], "url string, seq int"
    )
    assert eng.add_seeds(seeds2) == 20
    rows = eng.table.read().select("canonical_url", "seq").collect()
    seqs = sorted(int(r.seq) for r in rows)
    assert seqs == list(range(60))
    new_order = [
        r.canonical_url for r in sorted(rows, key=lambda r: r.seq) if r.seq >= 40
    ]
    assert new_order == urls2[20:]


def test_min_hosts_min_requests_floors(spark, tmp_path):
    """A2 floors parity (frontera BC_MIN_REQUESTS/BC_MIN_HOSTS): a hot host
    floods the queue; the floors force host diversity and stop the batch at
    the earliest qualifying take, exactly like the oracle."""
    from frontera_spark.core.oracle import OracleFrontier

    # hot host A gets 20 URLs queued first (lowest seq = popped first under
    # FIFO); hosts B..F get 2 each afterwards
    urls = [f"{H1}/hot/{i}" for i in range(20)] + [
        f"https://{c}.example.test/p/{i}" for c in "bcdef" for i in range(2)
    ]
    for kwargs in (
        {"min_requests": 8, "min_hosts": 3},
        {"min_requests": 3, "min_hosts": 5, "max_per_host": 4},
        {"min_requests": 25, "min_hosts": 2},   # floors beyond max_n → cap wins
        {"min_requests": 2, "min_hosts": 99},   # unreachable hosts floor
    ):
        name = "_".join(f"{k}{v}" for k, v in sorted(kwargs.items()))
        oracle = OracleFrontier(strategy="fifo", max_per_host=kwargs.get("max_per_host"))
        oracle.add_seeds(urls)
        exp = oracle.get_next_requests(
            16,
            min_requests=kwargs.get("min_requests"),
            min_hosts=kwargs.get("min_hosts"),
        )
        eng = FrontierEngine(spark, str(tmp_path / f"eng_{name}"), n_partitions=1, strategy="fifo")
        seeds = spark.createDataFrame([(u, i) for i, u in enumerate(urls)], "url string, seq int")
        eng.add_seeds(seeds)
        batch = eng.get_next_requests(16, mode="global", **kwargs)
        got = [r.canonical_url for r in batch.orderBy("seq").collect()]
        batch.unpersist()
        assert got == exp, f"{name}: {got} != {exp}"


def test_custom_strategy_defined_outside_engine(spark, tmp_path):
    """E1/P6 extension surface: a user-defined strategy (ordering = shortest
    canonical URL first, score = f(url length), link filter dropping '/skip'
    URLs) built OUTSIDE the engine module reproduces the oracle sequence and
    seen set."""
    from pyspark.sql import functions as F

    from frontera_spark.core.strategies import CustomStrategy

    graph = {
        f"{H1}/r": [f"{H1}/aaaaaa", f"{H1}/bb", f"{H1}/skip/x"],
        f"{H1}/bb": [f"{H1}/c", f"{H1}/skip/y", f"{H2}/dddd"],
        f"{H1}/aaaaaa": [f"{H1}/c", f"{H1}/e"],
    }
    short_first = CustomStrategy(
        name="short_first",
        ordering_fn=lambda it: [
            F.length("canonical_url").asc(), F.col("seq").asc(),
        ],
        score_expr=1.0 / (F.length("canonical_url") + 1.0),
        link_filter=~F.col("canonical_url").contains("/skip"),
    )
    eng = FrontierEngine(
        spark, str(tmp_path / "eng_custom"), n_partitions=1, strategy=short_first
    )
    got_order, got_states = run_crawl(eng, graph, [f"{H1}/r"], 2)

    exp_order, exp_states = crawl_sequence(
        graph,
        [f"{H1}/r"],
        strategy=lambda url, depth, seq: (len(url), seq),
        max_next_requests=2,
        link_filter=lambda url, depth: "/skip" not in url,
    )
    assert got_order == exp_order
    assert got_states == exp_states
    assert all("/skip" not in u for u in got_states)
