"""HTTP 3xx redirect handling in the crawl loop (CrawlLoop(redirects=...)):
a moved URL takes a zero-byte CRAWLED transition and its Location target
re-enters the frontier as a link at the same depth — so seen-dedup
collapses known targets, robots gates denied ones, chains resolve one hop
per iteration, and cycles terminate in the seen-set."""

from __future__ import annotations

import pyspark.sql.functions as F

from frontera_spark import STATE_CRAWLED
from frontera_spark.sources.corpus import url_of, write_corpus
from frontera_spark.streaming.loop import CrawlLoop

N, HOSTS, SEED = 24, 5, 42
MOVED = "https://moved.example.test/old"


def _mk(spark, tmp_path, corpus_path, **kw):
    kw.setdefault("strategy", "bfs")
    kw.setdefault("batch_size", 16)
    kw.setdefault("n_partitions", 2)
    kw.setdefault("mode", "global")
    kw.setdefault("check_invariant", False)
    return CrawlLoop(spark, str(tmp_path / "eng"), corpus_path, corpus_seed=SEED, **kw)


def _crawled_urls(loop):
    return {
        r["canonical_url"]
        for r in loop.engine.table.read()
        .filter(F.col("state") == STATE_CRAWLED)
        .select("canonical_url")
        .collect()
    }


def _with_moved_link(spark, tmp_path, extra_links):
    """Corpus whose root additionally links to the given synthetic URLs."""
    path = str(tmp_path / "corpus")
    write_corpus(spark, path, N, HOSTS, SEED)
    base = spark.read.parquet(path)
    root = url_of(0, HOSTS)
    patched = base.withColumn(
        "out_links",
        F.when(
            F.col("url") == root,
            F.concat("out_links", F.array(*[F.lit(u) for u in extra_links])),
        ).otherwise(F.col("out_links")),
    )
    out = str(tmp_path / "corpus_moved")
    patched.write.parquet(out)
    return out


def test_redirect_resolves_to_target(spark, tmp_path):
    # the moved URL redirects to a leaf the tree would NOT otherwise need
    # an extra hop for; target is also canonically reachable, so the
    # redirect must dedup against the normal discovery (no double fetch)
    target = url_of(7, HOSTS)
    corpus = _with_moved_link(spark, tmp_path, [MOVED])
    loop = _mk(spark, tmp_path, corpus, redirects={MOVED: target})
    loop.add_seeds([url_of(0, HOSTS)])
    hist = loop.run(max_iterations=40)
    urls = _crawled_urls(loop)
    # the moved URL is CRAWLED (zero-byte visit), all N real pages too
    assert MOVED in urls
    assert len(urls) == N + 1
    assert sum(m.get("n_redirects", 0) for m in hist) == 1
    assert sum(m.get("n_errors", 0) for m in hist) == 0
    # the target was fetched exactly once (dedup collapsed the redirect's
    # schedule with the canonical tree link): total fetched bytes visits
    # = N real pages + 1 zero-byte redirect visit
    assert sum(m["n_fetched"] for m in hist) == N + 1


def test_redirect_chain_resolves_one_hop_per_iteration(spark, tmp_path):
    hop2 = "https://moved.example.test/hop2"
    target = url_of(9, HOSTS)
    corpus = _with_moved_link(spark, tmp_path, [MOVED])
    loop = _mk(
        spark, tmp_path, corpus, redirects={MOVED: hop2, hop2: target}
    )
    loop.add_seeds([url_of(0, HOSTS)])
    hist = loop.run(max_iterations=40)
    urls = _crawled_urls(loop)
    assert {MOVED, hop2} <= urls
    assert len(urls) == N + 2
    assert sum(m.get("n_redirects", 0) for m in hist) == 2


def test_redirect_cycle_terminates(spark, tmp_path):
    a = "https://moved.example.test/a"
    b = "https://moved.example.test/b"
    corpus = _with_moved_link(spark, tmp_path, [a])
    loop = _mk(spark, tmp_path, corpus, redirects={a: b, b: a})
    loop.add_seeds([url_of(0, HOSTS)])
    hist = loop.run(max_iterations=40)
    urls = _crawled_urls(loop)
    # both hops crawled once; the cycle's re-offer of `a` dies in the
    # seen-set and the crawl exhausts normally
    assert {a, b} <= urls
    assert len(urls) == N + 2
    assert sum(m.get("n_redirects", 0) for m in hist) == 2
    assert sum(m.get("n_errors", 0) for m in hist) == 0


def test_redirect_to_denied_host_is_gated(spark, tmp_path):
    denied_target = "https://denied.example.test/x"
    corpus = _with_moved_link(spark, tmp_path, [MOVED])
    loop = _mk(
        spark, tmp_path, corpus,
        redirects={MOVED: denied_target},
        robots_deny_hosts=frozenset({"denied.example.test"}),
    )
    loop.add_seeds([url_of(0, HOSTS)])
    hist = loop.run(max_iterations=40)
    urls = _crawled_urls(loop)
    # source redirected and CRAWLED; the target rode the normal schedule
    # path, so robots denied it before it ever entered the frontier
    assert MOVED in urls
    assert denied_target not in urls
    assert sum(m.get("n_redirects", 0) for m in hist) == 1


def test_redirect_with_opic_transfers_cash(spark, tmp_path):
    # an accumulating strategy must not lose the source's cash: the loop
    # completes and the target is crawled (cash rode the redirect link)
    target = url_of(5, HOSTS)
    corpus = _with_moved_link(spark, tmp_path, [MOVED])
    loop = _mk(
        spark, tmp_path, corpus, strategy="opic", redirects={MOVED: target}
    )
    loop.add_seeds([url_of(0, HOSTS)])
    hist = loop.run(max_iterations=60)
    urls = _crawled_urls(loop)
    assert MOVED in urls and target in urls
    assert sum(m.get("n_redirects", 0) for m in hist) == 1
