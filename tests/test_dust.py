"""DUST rule mining (core/dust.py — Bar-Yossef et al. WWW'07 restricted to
per-host parameter-irrelevance rules): mining parity against a brute-force
Python model, rewrite golden cases, and the crawl-loop e2e — mined rules
collapse session-id aliases BEFORE they are fetched, with identical page
coverage and strictly fewer fetches than the dust-off control."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F
import pytest

from frontera_spark import STATE_CRAWLED
from frontera_spark.core.dust import (
    apply_dust_rules,
    mine_dust_rules,
    rules_to_map,
    strip_named_params_expr,
    strip_params_expr,
)
from frontera_spark.sources.corpus import generate_corpus, url_of
from frontera_spark.streaming.loop import CrawlLoop


# --------------------------------------------------------------- mining unit


def _fixture_rows(n=300):
    """(url, sig) log with known structure: `id` content-determining
    everywhere, `ref` irrelevant everywhere, `sess` irrelevant except on
    host h3 (where it changes the body)."""
    rows = []
    for d in range(n):
        host = f"h{d % 4}.example.test"
        params = [f"id={d % 25}"]
        if d % 3 == 0:
            params.append(f"sess={d % 7}")
        if d % 5 == 0:
            params.append(f"ref={d % 11}")
        sig = (d % 4) * 100 + (d % 25)
        if d % 4 == 3 and d % 3 == 0:
            sig += 1000 * (d % 7)
        rows.append((f"https://{host}/page?" + "&".join(params), sig))
    return rows


def _model(rows):
    """Brute-force miner over parsed (host, {k: v}, sig) tuples."""
    parsed = []
    for url, sig in rows:
        host = url.split("//")[1].split("/")[0]
        q = url.split("?", 1)[1] if "?" in url else ""
        params = dict(kv.split("=", 1) for kv in q.split("&") if kv)
        parsed.append((host, params, sig))
    vocab = defaultdict(set)
    for h, p, _ in parsed:
        vocab[h].update(p)
    out = {}
    for h in vocab:
        for prm in vocab[h]:
            groups = defaultdict(list)
            for hh, p, s in parsed:
                if hh != h:
                    continue
                rest = tuple(sorted((k, v) for k, v in p.items() if k != prm))
                groups[rest].append(s)
            multi = [g for g in groups.values() if len(g) > 1]
            viol = sum(1 for g in multi if len(set(g)) > 1)
            supp = sum(len(g) - 1 for g in multi if len(set(g)) == 1)
            out[(h, prm)] = (len(multi), viol, supp, len(multi) > 0 and viol == 0)
    return out


def test_mining_matches_brute_force_model(spark):
    rows = _fixture_rows()
    df = spark.createDataFrame(rows, "url string, sig long")
    got = {
        (r["host"], r["param"]): (
            r["n_groups"], r["n_violations"], r["support"], r["irrelevant"]
        )
        for r in mine_dust_rules(df).collect()
    }
    assert got == _model(rows)


def test_rule_semantics_on_fixture(spark):
    df = spark.createDataFrame(_fixture_rows(), "url string, sig long")
    m = rules_to_map(mine_dust_rules(df), min_support=2)
    # ref irrelevant on every host; sess everywhere EXCEPT h3; id nowhere
    assert m == {
        "h0.example.test": ["ref", "sess"],
        "h1.example.test": ["ref", "sess"],
        "h2.example.test": ["ref", "sess"],
        "h3.example.test": ["ref"],
    }


def test_no_rule_without_collision_evidence(spark):
    # every URL unique after any strip -> zero multi groups -> no rules
    df = spark.createDataFrame(
        [(f"https://h.example.test/p{i}?sess={i}", i) for i in range(20)],
        "url string, sig long",
    )
    assert rules_to_map(mine_dust_rules(df), min_support=1) == {}


# -------------------------------------------------------------- rewrite unit


def _rewrite(spark, url, rules_map):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(
        strip_params_expr(F.col("url"), rules_map).alias("u")
    ).head()["u"]


REWRITE_CASES = [
    # (url, expected) under {h.example.test: [sess, ref]}
    ("https://h.example.test/a?id=1&sess=9", "https://h.example.test/a?id=1"),
    ("https://h.example.test/a?sess=9", "https://h.example.test/a"),
    ("https://h.example.test/a", "https://h.example.test/a"),
    # unknown host: untouched
    ("https://other.example.test/a?sess=9", "https://other.example.test/a?sess=9"),
    # key-prefix collision: 'sessx' and 's' must NOT be stripped
    ("https://h.example.test/a?sessx=1&s=2&sess=3", "https://h.example.test/a?sessx=1&s=2"),
    # value-less token keys as itself
    ("https://h.example.test/a?sess&id=1", "https://h.example.test/a?id=1"),
    # order of kept params is preserved
    ("https://h.example.test/a?b=2&sess=1&a=1", "https://h.example.test/a?b=2&a=1"),
]


@pytest.mark.parametrize("url,expected", REWRITE_CASES)
def test_strip_params_golden(spark, url, expected):
    rules = {"h.example.test": ["sess", "ref"]}
    assert _rewrite(spark, url, rules) == expected


def test_strip_named_params_is_host_blind(spark):
    df = spark.createDataFrame(
        [("https://a.test/x?sess=1&id=2",), ("https://b.test/y?sess=9",)],
        "url string",
    )
    got = [
        r["u"]
        for r in df.select(
            strip_named_params_expr(F.col("url"), ("sess",)).alias("u")
        ).collect()
    ]
    assert got == ["https://a.test/x?id=2", "https://b.test/y"]


def test_apply_empty_rules_is_identity(spark):
    df = spark.createDataFrame([("https://a.test/x?sess=1",)], "url string")
    assert apply_dust_rules(df, {}) is df


def _strip_model(url: str, names: tuple[str, ...]) -> str:
    """Pure-Python reference of _strip_expr's documented semantics: split at
    the FIRST '?', drop empty '&' tokens, key = text before the first '=',
    re-join survivors in order, drop the '?' when none survive."""
    qpos = url.find("?")
    if qpos < 0:
        return url
    base, q = url[:qpos], url[qpos + 1 :]
    kept = [p for p in q.split("&") if p and p.split("=", 1)[0] not in names]
    return base + ("?" + "&".join(kept) if kept else "")


def test_strip_parity_on_adversarial_urls(spark):
    """One Spark job over the cross product of edge-case URL components —
    multiple '?', empty tokens, '=' in values, value-less keys, encoded
    lookalikes, key prefixes — pinned against the Python model."""
    bases = ["https://h.test/a", "https://h.test/", "http://h.test/p%20x"]
    queries = [
        "", "?", "?sess", "?sess=", "?sess=1", "?a=1&sess=2", "?sess=1&a=2",
        "?a=b=c&sess=d=e", "?&&a=1&&", "?sess=1&sess=2", "?%73ess=1",
        "?sessx=1&s=2", "?a=1?sess=2", "?x&sess&y", "?a=&sess=&b=",
    ]
    names = ("sess", "ref")
    urls = [b + q for b in bases for q in queries]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["u"]
        for r in df.select(
            strip_named_params_expr(F.col("url"), names).alias("u")
        ).collect()
    ]
    assert got == [_strip_model(u, names) for u in urls]


# ------------------------------------------------------------------ loop e2e

N, HOSTS, SEED = 40, 5, 42


@pytest.fixture(scope="module")
def aliased_corpus_path(spark, tmp_path_factory):
    """§1 corpus with an extra ALIASED cross-link per node: i links to
    (i*5+1) % N as url?sess=<i%3> — a target that is also reached through
    its canonical tree link, so the log accumulates (alias, canonical)
    collision evidence the miner can validate."""
    base = generate_corpus(spark, N, n_hosts=HOSTS, seed=SEED)
    alias_of = {
        i: url_of((i * 5 + 1) % N, HOSTS) + f"?sess={i % 3}" for i in range(N)
    }
    m = F.create_map(
        *[F.lit(x) for i in range(N) for x in (url_of(i, HOSTS), alias_of[i])]
    )
    aliased = base.withColumn(
        "out_links", F.concat("out_links", F.array(m[F.col("url")]))
    )
    path = str(tmp_path_factory.mktemp("aliased") / "corpus")
    aliased.write.parquet(path)
    return path


def _crawl(spark, tmp_path, corpus_path, **kw):
    loop = CrawlLoop(
        spark, str(tmp_path / "eng"), corpus_path, corpus_seed=SEED,
        strategy="bfs", batch_size=16, n_partitions=2, mode="global",
        server_ignores=("sess",), **kw,
    )
    loop.add_seeds([url_of(0, HOSTS)])
    metrics = loop.run(max_iterations=40)
    return loop, metrics


def _coverage(loop):
    urls = [
        r["canonical_url"]
        for r in loop.engine.table.read()
        .filter(F.col("state") == STATE_CRAWLED)
        .select("canonical_url")
        .collect()
    ]
    return {u.split("?")[0] for u in urls}, len(urls)


def test_dust_loop(spark, tmp_path, aliased_corpus_path):
    off_loop, off_metrics = _crawl(
        spark, tmp_path / "off", aliased_corpus_path, dust=None
    )
    on_loop, on_metrics = _crawl(
        spark, tmp_path / "on", aliased_corpus_path,
        dust={"every": 2, "min_support": 1},
    )
    off_cov, off_fetches = _coverage(off_loop)
    on_cov, on_fetches = _coverage(on_loop)
    # identical page coverage: every canonical page crawled in both runs
    assert off_cov == on_cov
    assert len(on_cov) == N
    # the control fetched aliases as separate pages; mined rules collapsed
    # (at least some of) them before the fetch
    assert off_fetches > N
    assert on_fetches < off_fetches
    # rules were actually mined and active
    assert any(m.get("n_dust_rules", 0) > 0 for m in on_metrics)


def test_dust_rules_survive_resume(spark, tmp_path, aliased_corpus_path):
    loop, _ = _crawl(
        spark, tmp_path / "r", aliased_corpus_path,
        dust={"every": 2, "min_support": 1},
    )
    assert loop._dust_rules  # the run mined something
    resumed = CrawlLoop(
        spark, str(tmp_path / "r" / "eng"), aliased_corpus_path, corpus_seed=SEED,
        strategy="bfs", batch_size=16, n_partitions=2, mode="global",
        server_ignores=("sess",), dust={"every": 2, "min_support": 1},
    )
    resumed._recover()
    # rules are a pure function of the rollback-exact dust logs: a resumed
    # loop re-mines the exact rule set the finished run held
    assert resumed._dust_rules == loop._dust_rules
