"""Engine-side crawl tester — the FrontierTester/DownloaderSimulator analogue
(frontera/utils/tester.py:~1-150, tests/backends.py:~30-80).

Drives a FrontierEngine against an in-memory site graph and records the
emitted URL order. Test-only: the production path is the corpus-table join
loop in frontera_spark/streaming/loop.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from frontera_spark.core.frontier import FrontierEngine


def run_crawl(
    engine: FrontierEngine,
    graph: dict[str, list[str]],
    seeds: list[str],
    max_next_requests: int,
    max_per_host: int | None = None,
    max_iterations: int = 1000,
    mode: str = "global",
    page_texts: dict[str, str] | None = None,
) -> tuple[list[str], dict]:
    """Crawl to exhaustion; return (fetch order, {canonical_url: state})."""
    spark = engine.spark
    seeds_df = spark.createDataFrame(
        [(u, i) for i, u in enumerate(seeds)], "url string, seq int"
    )
    engine.add_seeds(seeds_df)
    order: list[str] = []
    for _ in range(max_iterations):
        batch = engine.get_next_requests(
            max_next_requests, max_per_host=max_per_host, mode=mode, mark=False
        )
        rows = batch.orderBy(*engine.strategy.ordering(engine.iteration)).collect()
        if not rows:
            break
        order.extend(r.canonical_url for r in rows)
        engine.page_crawled(batch)
        opic = engine.strategy.accumulates_cash
        texts = page_texts or {}
        links = [
            (
                link,
                r.seq,
                pos,
                r.depth + 1,
                engine.strategy.price_links_py(
                    r.score, len(out), texts.get(r.canonical_url, "")
                ),
            )
            for r in rows
            for out in [graph.get(r.canonical_url, [])]
            for pos, link in enumerate(out)
        ]
        batch.unpersist()
        if links:
            schema = "url string, parent_seq long, link_pos int, depth int, _cash double"
            links_df = spark.createDataFrame(links, schema)
            if not opic:
                # plain strategies ignore cash pricing
                links_df = links_df.drop("_cash")
            engine.links_extracted(links_df)
    states = {
        r.canonical_url: r.state
        for r in engine.table.read().select("canonical_url", "state").collect()
    }
    return order, states
