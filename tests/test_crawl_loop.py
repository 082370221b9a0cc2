"""E2E crawl-loop slice (SURVEY.md §7.1 M4): corpus-backed fetch simulation,
payload invariant, ordering parity vs the oracle, metrics lineage, resume."""

import os

import pytest
from pyspark.sql import functions as F

from frontera_spark import STATE_CRAWLED
from frontera_spark.core.oracle import crawl_sequence
from frontera_spark.sources.corpus import url_of, write_corpus
from frontera_spark.streaming.loop import CrawlLoop

N_IMAGES, N_HOSTS, SEED = 40, 7, 42


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus") / "corpus")
    write_corpus(spark, path, N_IMAGES, N_HOSTS, SEED)
    return path


def corpus_graph(spark, corpus_path):
    rows = spark.read.parquet(corpus_path).select("url", "out_links").collect()
    return {r.url: list(r.out_links) for r in rows}


def make_loop(spark, workdir, corpus_path, **kw):
    kw.setdefault("strategy", "bfs")
    kw.setdefault("batch_size", 16)
    kw.setdefault("n_partitions", 1)
    kw.setdefault("mode", "global")
    return CrawlLoop(spark, workdir, corpus_path, corpus_seed=SEED, **kw)


def crawl_order(loop):
    """Fetch order from the frontier table: (batch_id, strategy order)."""
    eng = loop.engine
    rows = (
        eng.table.read()
        .filter(F.col("state") == STATE_CRAWLED)
        .orderBy(F.col("batch_id").asc(), *eng.strategy.ordering())
        .select("canonical_url")
        .collect()
    )
    return [r.canonical_url for r in rows]


def test_full_crawl_matches_oracle(spark, tmp_path, corpus_path):
    loop = make_loop(spark, str(tmp_path / "eng"), corpus_path)
    seeds = [url_of(0, N_HOSTS)]
    loop.add_seeds(seeds)
    hist = loop.run()

    graph = corpus_graph(spark, corpus_path)
    exp_order, exp_states = crawl_sequence(graph, seeds, "bfs", 16)

    assert sum(m["n_fetched"] for m in hist) == len(exp_order)
    assert sum(m["invariant_violations"] for m in hist) == 0
    assert crawl_order(loop) == exp_order
    got_states = {
        r.canonical_url: r.state
        for r in loop.engine.table.read().select("canonical_url", "state").collect()
    }
    assert got_states == exp_states

    # per-partition lineage metrics: one row set per iteration, fetch counts
    # reconcile with history
    m = loop.metrics()
    per_iter = {
        r.iteration: r.total
        for r in m.groupBy("iteration").agg(F.sum("n_fetched").alias("total")).collect()
    }
    assert sum(per_iter.values()) == len(exp_order)


def test_invariant_detects_tampered_payload(spark, tmp_path, corpus_path):
    # flip pixels in one stored image: PSNR collapses → violation counted
    tampered_path = str(tmp_path / "tampered")
    corpus = spark.read.parquet(corpus_path)
    from frontera_spark.sources.corpus import stored_pixels
    from frontera_spark.sources.png import encode_png

    bad = stored_pixels(SEED, 0)
    bad = 255 - bad  # invert
    bad_bytes = bytearray(encode_png(bad))
    corpus.withColumn(
        "bytes",
        F.when(F.col("image_id") == "img00000000", F.lit(bytes(bad_bytes))).otherwise(
            F.col("bytes")
        ),
    ).write.mode("overwrite").parquet(tampered_path)

    loop = make_loop(spark, str(tmp_path / "eng"), tampered_path)
    loop.add_seeds([url_of(0, N_HOSTS)])
    m = loop.run_iteration()
    assert m["invariant_violations"] == 1


def test_missing_page_is_request_error(spark, tmp_path, corpus_path):
    loop = make_loop(spark, str(tmp_path / "eng"), corpus_path)
    # a URL shaped like a corpus URL but absent from it
    loop.add_seeds([f"https://h000.example.test/i/img99999999", url_of(0, N_HOSTS)])
    m = loop.run_iteration()
    assert m["n_errors"] == 1
    from frontera_spark import STATE_ERROR

    states = {
        r.canonical_url: r.state
        for r in loop.engine.table.read().select("canonical_url", "state").collect()
    }
    assert states["https://h000.example.test/i/img99999999"] == STATE_ERROR


def test_resume_equals_uninterrupted(spark, tmp_path, corpus_path):
    seeds = [url_of(0, N_HOSTS)]

    # uninterrupted reference run
    ref = make_loop(spark, str(tmp_path / "ref"), corpus_path)
    ref.add_seeds(seeds)
    ref.run()
    ref_states = {
        (r.canonical_url, r.state, r.seq)
        for r in ref.engine.table.read().select("canonical_url", "state", "seq").collect()
    }

    # interrupted run: 2 iterations, then a NEW CrawlLoop over the same
    # workdir (fresh objects = process restart) continues to exhaustion
    part = make_loop(spark, str(tmp_path / "part"), corpus_path)
    part.add_seeds(seeds)
    part.run(max_iterations=2)
    resumed = make_loop(spark, str(tmp_path / "part"), corpus_path)
    resumed.run()
    got = {
        (r.canonical_url, r.state, r.seq)
        for r in resumed.engine.table.read().select("canonical_url", "state", "seq").collect()
    }
    assert got == ref_states


def test_vacuum_during_run_keeps_correctness(spark, tmp_path, corpus_path):
    """Aggressive vacuuming mid-crawl must not change results, and must bound
    the number of retained snapshot data dirs."""
    loop = make_loop(spark, str(tmp_path / "eng"), corpus_path, batch_size=8)
    loop.add_seeds([url_of(0, N_HOSTS)])
    hist = loop.run(vacuum_every=2, vacuum_keep=4)
    assert sum(m["n_fetched"] for m in hist) == N_IMAGES
    data_dir = os.path.join(str(tmp_path / "eng"), "frontier", "data")
    n_dirs = len([d for d in os.listdir(data_dir) if d.startswith("snap-")])
    total_snapshots = loop.engine.table.snapshot_id
    # the crawl really did commit many times: with fused ingestion each
    # iteration is exactly one pop-mark + one MERGE commit, so >= iterations
    assert total_snapshots >= len(hist) + 2  # + seed commit(s)
    assert total_snapshots > n_dirs  # vacuum actually dropped old dirs
    assert n_dirs < 15  # ...but only the retained window's dirs remain


def test_recover_requeues_marked_but_uncrawled(spark, tmp_path, corpus_path):
    loop = make_loop(spark, str(tmp_path / "eng"), corpus_path)
    loop.add_seeds([url_of(0, N_HOSTS)])
    # simulate a crash right after the feed was marked: pop without crawling
    batch = loop.engine.get_next_requests(16, mode="global")
    popped = {r.canonical_url for r in batch.collect()}
    batch.unpersist()
    assert popped
    # restart: _recover() must re-queue, then the crawl proceeds to the end
    resumed = make_loop(spark, str(tmp_path / "eng"), corpus_path)
    hist = resumed.run()
    assert sum(m["n_fetched"] for m in hist) == N_IMAGES


def test_rollback_resume_equals_uninterrupted(spark, tmp_path, corpus_path):
    """North rule: resumable mid-crawl from ANY retained snapshot. Roll the
    frontier table back to a mid-crawl snapshot and resume with a fresh
    CrawlLoop: the stale-ahead seen shards must rebuild (seen_gen mismatch),
    marked-but-rolled-back rows must re-queue, and the finished crawl must be
    state-identical to an uninterrupted run."""
    seeds = [url_of(0, N_HOSTS)]

    ref = make_loop(spark, str(tmp_path / "ref"), corpus_path)
    ref.add_seeds(seeds)
    ref.run()
    ref_states = {
        (r.canonical_url, r.state, r.seq)
        for r in ref.engine.table.read().select("canonical_url", "state", "seq").collect()
    }

    part = make_loop(spark, str(tmp_path / "rb"), corpus_path, use_seen_shards=True)
    part.add_seeds(seeds)
    part.run(max_iterations=4)
    table = part.engine.table
    assert table.snapshot_id >= 4
    # roll back roughly half the crawl's commits (a mid-iteration snapshot
    # is fair game: recovery must handle marks without their MERGE)
    mid = max(1, table.snapshot_id // 2)
    table.rollback(mid)
    n_after_rb = table.read().count()

    resumed = make_loop(spark, str(tmp_path / "rb"), corpus_path, use_seen_shards=True)
    # the seen shards were synced past the rolled-back generation; the
    # engine must have detected the mismatch and rebuilt them
    assert not resumed.engine.seen.stale(resumed.engine.seen_gen)
    resumed.run()
    got = {
        (r.canonical_url, r.state, r.seq)
        for r in resumed.engine.table.read().select("canonical_url", "state", "seq").collect()
    }
    assert got == ref_states
    # sanity: the rollback actually discarded frontier rows (re-crawl happened)
    assert n_after_rb < len(ref_states)
