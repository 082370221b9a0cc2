"""Conditional re-fetch (HTTP 304 / If-None-Match analog) on the revisit
path: a popped page whose current content signature equals the stored
last_sig skips the payload path — no bytes read, no decode, no link
re-extraction — while the crawl's observable state (fetch log, frontier
table, revisit schedule) stays IDENTICAL to the unconditional run.

frontera analog: none — frontera always hands the request to the fetcher;
validators live in scrapy's HttpCacheMiddleware. At 10^10-URL revisit scale
the skipped `bytes` column is the dominant IO term, so the engine carves it
out inside the scheduler (streaming/loop.py::_conditional_split).
"""

import pytest
from pyspark.sql import functions as F

from frontera_spark.sources.corpus import url_of, write_corpus
from frontera_spark.streaming.loop import CrawlLoop

N_IMAGES, N_HOSTS, SEED = 40, 7, 42
DYNAMIC = {"h001.example.test": 2}  # content version advances every 2 iters


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus") / "corpus")
    write_corpus(spark, path, N_IMAGES, N_HOSTS, SEED)
    return path


def _run(spark, workdir, corpus_path, conditional):
    loop = CrawlLoop(
        spark,
        workdir,
        corpus_path,
        corpus_seed=SEED,
        strategy="bfs",
        batch_size=16,
        n_partitions=2,
        mode="global",
        dynamic_hosts=DYNAMIC,
        revisit={
            "every": 2,
            "bootstrap_after": 2,
            "mode": "incremental",
            "conditional": conditional,
        },
    )
    loop.add_seeds([url_of(0, N_HOSTS)])
    hist = loop.run(max_iterations=14)
    return loop, hist


def _table_state(loop):
    return sorted(
        (r["canonical_url"], r["state"], r["depth"])
        for r in loop.engine.table.read().collect()
    )


def _fetch_log(loop):
    import os

    log = loop.spark.read.option("basePath", loop.fetchlog_dir).parquet(
        os.path.join(loop.fetchlog_dir, "iter=*")
    )
    return sorted(
        (r["fingerprint"], r["iteration"], r["sig"]) for r in log.collect()
    )


def test_conditional_revisit_parity_and_savings(spark, tmp_path, corpus_path):
    full, hist_f = _run(spark, str(tmp_path / "full"), corpus_path, False)
    cond, hist_c = _run(spark, str(tmp_path / "cond"), corpus_path, True)

    # the conditional leg actually fired: some revisits were served as 304s
    n_notmod = sum(m.get("n_not_modified", 0) for m in hist_c)
    assert n_notmod > 0

    # ... and strictly fewer payload bytes moved (the 100 TB term)
    bytes_f = sum(m["bytes_fetched"] for m in hist_f)
    bytes_c = sum(m["bytes_fetched"] for m in hist_c)
    assert bytes_c < bytes_f

    # visits are accounted identically: every 304 is still a fetch
    assert sum(m["n_fetched"] for m in hist_c) == sum(
        m["n_fetched"] for m in hist_f
    )
    assert sum(m["invariant_violations"] for m in hist_c) == 0

    # observable crawl state is bit-identical: the fetch log (including the
    # non-change observations the estimator feeds on) and the final table
    assert _fetch_log(cond) == _fetch_log(full)
    assert _table_state(cond) == _table_state(full)


def test_conditional_refetches_changed_pages(spark, tmp_path, corpus_path):
    """A page whose signature CHANGED between visits must take the full
    path — 304s only ever cover proven-unchanged pages."""
    cond, hist = _run(spark, str(tmp_path / "eng"), corpus_path, True)
    import os

    log = cond.spark.read.option("basePath", cond.fetchlog_dir).parquet(
        os.path.join(cond.fetchlog_dir, "iter=*")
    )
    # dynamic-host pages revisited across a version boundary log >=2
    # distinct sigs — impossible if the conditional path had served them
    # from the stale validator
    changed = (
        log.groupBy("fingerprint")
        .agg(F.countDistinct("sig").alias("n_sigs"))
        .filter(F.col("n_sigs") >= 2)
        .count()
    )
    assert changed > 0


def test_conditional_requires_incremental_mode(spark, tmp_path, corpus_path):
    with pytest.raises(ValueError, match="conditional"):
        CrawlLoop(
            spark,
            str(tmp_path / "eng"),
            corpus_path,
            revisit={"mode": "full", "conditional": True},
        )
