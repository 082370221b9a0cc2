"""Content-level duplicate detection on the crawl path (mirror handling):
CrawlLoop(content_dedup=True) — pages whose body signature was already
crawled at another URL keep their CRAWLED transition but contribute no
links, so a mirror's subtree is never scheduled twice.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from frontera_spark import STATE_CRAWLED
from frontera_spark.sources.corpus import generate_corpus, url_of
from frontera_spark.streaming.loop import CrawlLoop

N, HOSTS, SEED = 24, 7, 42


@pytest.fixture(scope="module")
def mirrored_corpus_path(spark, tmp_path_factory):
    """The §1 corpus plus a full mirror: every page exists a second time at
    mirror.example.test/<image_id>, same image_id (= same body signature),
    with out_links rewritten onto the mirror host (a real mirror's links
    point into itself)."""
    base = generate_corpus(spark, N, n_hosts=HOSTS, seed=SEED)
    mirror = (
        base.withColumn(
            "url", F.concat(F.lit("https://mirror.example.test/i/"), F.col("image_id"))
        ).withColumn(
            "out_links",
            F.transform(
                "out_links",
                lambda u: F.concat(
                    F.lit("https://mirror.example.test/i/"),
                    F.element_at(F.split(u, "/"), -1),
                ),
            ),
        )
    )
    path = str(tmp_path_factory.mktemp("mirrored") / "corpus")
    base.unionByName(mirror).write.parquet(path)
    return path


def _crawl(spark, tmp_path, corpus_path, **kw):
    loop = CrawlLoop(
        spark, str(tmp_path / "eng"), corpus_path, corpus_seed=SEED,
        strategy="bfs", batch_size=16, n_partitions=2, mode="global", **kw,
    )
    loop.add_seeds([url_of(0, HOSTS), "https://mirror.example.test/i/img00000000"])
    metrics = loop.run(max_iterations=30)
    return loop, metrics


def test_content_dedup_blocks_mirror_links(spark, tmp_path, mirrored_corpus_path):
    loop, metrics = _crawl(spark, tmp_path, mirrored_corpus_path, content_dedup=True)
    crawled = (
        loop.engine.table.read()
        .filter(F.col("state") == STATE_CRAWLED)
        .select("canonical_url")
        .collect()
    )
    urls = {r["canonical_url"] for r in crawled}
    # both seeds were fetched (the mirror root IS crawled — dedup only
    # blocks link extraction), and every original page was reached
    assert sum(1 for u in urls if u.startswith("https://mirror.")) == 1
    assert sum(1 for u in urls if not u.startswith("https://mirror.")) == N
    # the duplicate was counted
    assert sum(m.get("n_content_dups", 0) for m in metrics) == 1


def test_without_flag_mirror_subtree_is_crawled(spark, tmp_path, mirrored_corpus_path):
    loop, metrics = _crawl(spark, tmp_path, mirrored_corpus_path, content_dedup=False)
    urls = {
        r["canonical_url"]
        for r in loop.engine.table.read()
        .filter(F.col("state") == STATE_CRAWLED)
        .select("canonical_url")
        .collect()
    }
    # control: the mirror's whole subtree gets crawled without the flag
    assert sum(1 for u in urls if u.startswith("https://mirror.")) == N
    assert all("n_content_dups" not in m for m in metrics)


def test_dedup_within_single_batch(spark, tmp_path, mirrored_corpus_path):
    """Seed the original AND mirror of the same leaf page in one batch:
    exactly one of the two may win link extraction."""
    loop = CrawlLoop(
        spark, str(tmp_path / "eng1"), mirrored_corpus_path, corpus_seed=SEED,
        strategy="bfs", batch_size=16, n_partitions=2, mode="global",
        content_dedup=True,
    )
    leaf = N - 1
    loop.add_seeds(
        [url_of(leaf, HOSTS), f"https://mirror.example.test/i/img{leaf:08d}"]
    )
    metrics = loop.run(max_iterations=4)
    assert sum(m["n_fetched"] for m in metrics) >= 2  # both URLs fetched
    assert sum(m.get("n_content_dups", 0) for m in metrics) >= 1

def test_bloom_gate_skips_log_on_all_new_content(spark, tmp_path):
    """A crawl of all-unique content must never read the signature log:
    every iteration's bloom-maybe count is 0 (the n_sig_maybe observable),
    while duplicates still register as maybes on the mirrored corpus."""
    base = generate_corpus(spark, N, n_hosts=HOSTS, seed=SEED)
    path = str(tmp_path / "plain")
    base.write.parquet(path)
    loop = CrawlLoop(
        spark, str(tmp_path / "eng"), path, corpus_seed=SEED,
        strategy="bfs", batch_size=16, n_partitions=2, mode="global",
        content_dedup=True,
    )
    loop.add_seeds([url_of(0, HOSTS)])
    metrics = loop.run(max_iterations=30)
    assert sum(m["n_fetched"] for m in metrics) == N
    assert all(m.get("n_sig_maybe", 0) == 0 for m in metrics)
    assert sum(m.get("n_content_dups", 0) for m in metrics) == 0


def test_mirror_dup_registers_as_maybe(spark, tmp_path, mirrored_corpus_path):
    """A CROSS-iteration duplicate (mirror seed scheduled after the
    original's signature was committed) must register as a bloom maybe —
    the path the within-batch window can't catch. Same-batch duplicates
    (the other tests) are caught by the window BEFORE the bloom, so they
    report n_sig_maybe == 0."""
    wd = str(tmp_path / "eng")
    loop = CrawlLoop(
        spark, wd, mirrored_corpus_path, corpus_seed=SEED,
        strategy="bfs", batch_size=16, n_partitions=2, mode="global",
        content_dedup=True,
    )
    loop.add_seeds([url_of(0, HOSTS)])
    loop.run(max_iterations=30)  # originals fully crawled, sigs committed

    loop.add_seeds(["https://mirror.example.test/i/img00000000"])
    metrics2 = loop.run(max_iterations=4)
    assert sum(m.get("n_sig_maybe", 0) for m in metrics2) >= 1
    assert sum(m.get("n_content_dups", 0) for m in metrics2) == 1


def test_resume_continues_content_dedup(spark, tmp_path, mirrored_corpus_path):
    """Interrupt after 2 iterations; a NEW CrawlLoop on the same workdir
    must end in the same crawl set as the uninterrupted run (shards and
    logs picked up across process boundaries)."""
    wd = str(tmp_path / "eng")
    loop = CrawlLoop(
        spark, wd, mirrored_corpus_path, corpus_seed=SEED,
        strategy="bfs", batch_size=16, n_partitions=2, mode="global",
        content_dedup=True,
    )
    loop.add_seeds([url_of(0, HOSTS), "https://mirror.example.test/i/img00000000"])
    loop.run(max_iterations=2)

    loop2 = CrawlLoop(
        spark, wd, mirrored_corpus_path, corpus_seed=SEED,
        strategy="bfs", batch_size=16, n_partitions=2, mode="global",
        content_dedup=True,
    )
    metrics2 = loop2.run(max_iterations=30)
    urls = {
        r["canonical_url"]
        for r in loop2.engine.table.read()
        .filter(F.col("state") == STATE_CRAWLED)
        .select("canonical_url")
        .collect()
    }
    assert sum(1 for u in urls if u.startswith("https://mirror.")) == 1
    assert sum(1 for u in urls if not u.startswith("https://mirror.")) == N


def test_lost_shards_rebuilt_from_log(spark, tmp_path, mirrored_corpus_path):
    """Delete the bloom shard files mid-crawl: _recover() must rebuild them
    from the exact signature logs, so the mirror root (whose original was
    crawled before the interruption) is still caught as a duplicate."""
    import os, shutil

    wd = str(tmp_path / "eng")
    loop = CrawlLoop(
        spark, wd, mirrored_corpus_path, corpus_seed=SEED,
        strategy="bfs", batch_size=16, n_partitions=2, mode="global",
        content_dedup=True,
    )
    # original root first; the mirror root enters on resume
    loop.add_seeds([url_of(0, HOSTS)])
    loop.run(max_iterations=2)
    shard_dir = os.path.join(wd, "contentlog", "seen_shards")
    assert os.path.isdir(shard_dir) and os.listdir(shard_dir)
    shutil.rmtree(shard_dir)

    loop2 = CrawlLoop(
        spark, wd, mirrored_corpus_path, corpus_seed=SEED,
        strategy="bfs", batch_size=16, n_partitions=2, mode="global",
        content_dedup=True,
    )
    loop2.add_seeds(["https://mirror.example.test/i/img00000000"])
    metrics2 = loop2.run(max_iterations=30)
    urls = {
        r["canonical_url"]
        for r in loop2.engine.table.read()
        .filter(F.col("state") == STATE_CRAWLED)
        .select("canonical_url")
        .collect()
    }
    # without the rebuild the empty bloom says "definitely new" for the
    # mirror root and its subtree gets scheduled
    assert sum(1 for u in urls if u.startswith("https://mirror.")) == 1
    assert sum(m.get("n_content_dups", 0) for m in metrics2) == 1


def test_overfilled_content_shards_stay_exact(spark, tmp_path, mirrored_corpus_path):
    """content_shard_capacity far below the crawl's signature count: the
    bloom overfills (FP rate climbs toward 1, every sig reads as 'maybe')
    but dedup results must be IDENTICAL — the exact log anti-join, not the
    bloom, decides. Capacity is a cost knob, never a correctness knob."""
    loop, metrics = _crawl(
        spark, tmp_path, mirrored_corpus_path,
        content_dedup=True, content_shard_capacity=4,
    )
    urls = {
        r["canonical_url"]
        for r in loop.engine.table.read()
        .filter(F.col("state") == STATE_CRAWLED)
        .select("canonical_url")
        .collect()
    }
    assert sum(1 for u in urls if u.startswith("https://mirror.")) == 1
    assert sum(1 for u in urls if not u.startswith("https://mirror.")) == N
    assert sum(m.get("n_content_dups", 0) for m in metrics) == 1
    # the overfilled bloom must actually be firing maybes (the point of
    # the fixture) — otherwise this test isn't exercising the exact path
    assert sum(m.get("n_sig_maybe", 0) for m in metrics) >= 1
