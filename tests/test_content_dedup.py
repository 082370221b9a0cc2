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
