"""robots.txt rule evaluation (core/robots.py): parser golden cases,
longest-match/Allow-ties precedence, and the engine middleware hook."""

import pytest
from pyspark.sql import functions as F

from frontera_spark.core.robots import (
    parse_robots_txt,
    robots_middleware,
    rules_df,
    with_allowed,
)


def test_parse_star_group():
    txt = """
# comment
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 10

User-agent: badbot
Disallow: /
"""
    assert parse_robots_txt(txt) == [("deny", "/private/"), ("allow", "/private/ok")]


def test_parse_multi_agent_run_includes_star():
    txt = "User-agent: badbot\nUser-agent: *\nDisallow: /x\n"
    assert parse_robots_txt(txt) == [("deny", "/x")]


def test_parse_non_star_group_ignored():
    assert parse_robots_txt("User-agent: badbot\nDisallow: /\n") == []


def test_parse_empty_disallow_yields_nothing():
    assert parse_robots_txt("User-agent: *\nDisallow:\n") == []


def test_parse_group_reset_after_rules():
    # a second group that does NOT name * must not inherit applicability
    txt = "User-agent: *\nDisallow: /a\nUser-agent: badbot\nDisallow: /b\n"
    assert parse_robots_txt(txt) == [("deny", "/a")]


@pytest.fixture()
def links(spark):
    rows = [
        ("https://a.test/private/x", "a.test"),
        ("https://a.test/private/ok/y", "a.test"),
        ("https://a.test/public", "a.test"),
        ("https://b.test/private/x", "b.test"),  # no rules for b.test
        ("https://a.test/tie", "a.test"),
    ]
    return spark.createDataFrame(rows, "url string, host string")


def test_with_allowed_precedence(spark, links):
    rules = rules_df(
        spark,
        {
            "a.test": (
                "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
                "Disallow: /tie\nAllow: /tie\n"  # equal length: Allow wins
            )
        },
    )
    out = {r["url"]: r["allowed"] for r in with_allowed(links, rules).collect()}
    assert out == {
        "https://a.test/private/x": False,
        "https://a.test/private/ok/y": True,  # longer Allow overrides
        "https://a.test/public": True,  # no matching prefix
        "https://b.test/private/x": True,  # rule-less host
        "https://a.test/tie": True,  # equal-length tie -> Allow
    }
    assert with_allowed(links, rules).count() == links.count()


def test_robots_middleware_drops_denied(spark, tmp_path):
    from frontera_spark.core.frontier import FrontierEngine

    rules = rules_df(spark, {"h1.example.test": "User-agent: *\nDisallow: /deny\n"})
    eng = FrontierEngine(
        spark,
        str(tmp_path / "eng"),
        n_partitions=4,
        middlewares=[robots_middleware(rules)],
    )
    seeds = spark.createDataFrame(
        [
            ("https://h1.example.test/deny/a",),
            ("https://h1.example.test/ok/b",),
            ("https://h2.example.test/deny/c",),
        ],
        "url string",
    )
    n = eng.add_seeds(seeds)
    assert n == 2
    urls = {r["canonical_url"] for r in eng.table.read().select("canonical_url").collect()}
    assert urls == {"https://h1.example.test/ok/b", "https://h2.example.test/deny/c"}


def test_bare_host_url_hits_root_rules(spark):
    """'https://a.test' (no trailing slash) parses to PATH '' — it must be
    treated as '/' so a Disallow: / full ban catches it."""
    rules = rules_df(spark, {"a.test": "User-agent: *\nDisallow: /\n"})
    links = spark.createDataFrame(
        [("https://a.test", "a.test"), ("https://a.test/", "a.test")],
        "url string, host string",
    )
    out = {r["url"]: r["allowed"] for r in with_allowed(links, rules).collect()}
    assert out == {"https://a.test": False, "https://a.test/": False}


def test_middleware_matches_canonical_path(spark, tmp_path):
    """Percent-encoding must not dodge a deny rule: the middleware matches
    rules against canonical_url (where %64 has been normalized to 'd')."""
    from frontera_spark.core.frontier import FrontierEngine

    rules = rules_df(spark, {"h1.example.test": "User-agent: *\nDisallow: /deny\n"})
    eng = FrontierEngine(
        spark,
        str(tmp_path / "eng2"),
        n_partitions=2,
        middlewares=[robots_middleware(rules)],
    )
    n = eng.add_seeds(
        spark.createDataFrame(
            [("https://h1.example.test/%64eny/a",), ("https://h1.example.test/ok",)],
            "url string",
        )
    )
    assert n == 1
    urls = {r["canonical_url"] for r in eng.table.read().collect()}
    assert urls == {"https://h1.example.test/ok"}


# ---------------- RFC 9309 §2.2.3 special characters (*, trailing $) -------


def test_pattern_regex_compilation():
    from frontera_spark.core.robots import pattern_regex

    assert pattern_regex("/plain") is None  # prefix fast path
    assert pattern_regex("/fish*") == "^/fish.*"
    assert pattern_regex("/*.php$") == r"^/.*\.php$"
    assert pattern_regex("/a$b") is None  # mid-pattern $ is a literal octet
    assert pattern_regex("/a$b*") == r"^/a\$b.*"
    assert pattern_regex("*") == "^.*"


def test_with_allowed_wildcards(spark):
    """Golden cases lifted from the RFC 9309 / Google robots documentation:
    '*' spans any run, trailing '$' anchors, precedence = pattern octets."""
    rules = rules_df(
        spark,
        {
            "a.test": (
                "User-agent: *\n"
                "Disallow: /*.php$\n"      # deny .php pages (len 8)
                "Allow: /public*.php$\n"   # carve-out (len 14 > 8)
                "Disallow: /fish*\n"       # deny the fish subtree (len 6)
            )
        },
    )
    links = spark.createDataFrame(
        [
            ("https://a.test/index.php", "a.test"),
            ("https://a.test/index.php?x=1", "a.test"),  # $ must NOT match
            ("https://a.test/public_x.php", "a.test"),   # longer Allow wins
            ("https://a.test/fishheads/y", "a.test"),
            ("https://a.test/fis", "a.test"),
            ("https://a.test/other", "a.test"),
        ],
        "url string, host string",
    )
    out = {r["url"]: r["allowed"] for r in with_allowed(links, rules).collect()}
    assert out == {
        "https://a.test/index.php": False,
        "https://a.test/index.php?x=1": True,
        "https://a.test/public_x.php": True,
        "https://a.test/fishheads/y": False,
        "https://a.test/fis": True,
        "https://a.test/other": True,
    }


def test_with_allowed_query_matching(spark):
    """Rules match path-and-query: a query-carrying Disallow is honored and
    plain prefixes still hit query-carrying URLs."""
    rules = rules_df(
        spark,
        {"a.test": "User-agent: *\nDisallow: /search?q=\nDisallow: /d/1\n"},
    )
    links = spark.createDataFrame(
        [
            ("https://a.test/search?q=x", "a.test"),
            ("https://a.test/search", "a.test"),
            ("https://a.test/d/1?page=2", "a.test"),
        ],
        "url string, host string",
    )
    out = {r["url"]: r["allowed"] for r in with_allowed(links, rules).collect()}
    assert out == {
        "https://a.test/search?q=x": False,
        "https://a.test/search": True,
        "https://a.test/d/1?page=2": False,
    }


# ---------------- Crawl-delay → politeness policies ------------------------


def test_parse_robots_crawl_delay():
    from frontera_spark.core.robots import parse_robots

    rules, delay = parse_robots(
        "User-agent: *\nDisallow: /private/\nCrawl-delay: 2.5\n"
    )
    assert rules == [("deny", "/private/")]
    assert delay == 2.5
    # non-star group's delay is ignored; invalid / negative values skipped
    assert parse_robots("User-agent: bad\nCrawl-delay: 9\n")[1] is None
    assert parse_robots("User-agent: *\nCrawl-delay: soon\n")[1] is None
    assert parse_robots("User-agent: *\nCrawl-delay: -1\n")[1] is None


def test_is_full_ban():
    from frontera_spark.core.robots import is_full_ban, parse_robots_txt

    assert is_full_ban(parse_robots_txt("User-agent: *\nDisallow: /\n"))
    assert not is_full_ban(
        parse_robots_txt("User-agent: *\nDisallow: /\nAllow: /ok\n")
    )
    assert not is_full_ban(parse_robots_txt("User-agent: *\nDisallow: /x\n"))


def test_policies_from_robots(spark):
    from frontera_spark.core.robots import policies_from_robots

    pol = policies_from_robots(
        spark,
        {
            "fast.test": "User-agent: *\nCrawl-delay: 1\n",
            "slow.test": "User-agent: *\nCrawl-delay: 4\nDisallow: /tmp\n",
            "banned.test": "User-agent: *\nDisallow: /\n",
            "plain.test": "",
        },
        default_delay_s=2.0,
    )
    rows = {r["host"]: r for r in pol.collect()}
    assert rows["fast.test"]["delay_s"] == 1.0 and rows["fast.test"]["robots_allow"]
    assert rows["slow.test"]["delay_s"] == 4.0 and rows["slow.test"]["robots_allow"]
    assert rows["banned.test"]["robots_allow"] is False
    assert rows["plain.test"]["delay_s"] == 2.0
    assert all(r["budget"] is None for r in rows.values())


def test_crawl_delay_throttles_scheduler(spark, tmp_path):
    """End-to-end: Crawl-delay from robots.txt drives the politeness token
    bucket — over the same clock window the delay-4 host yields ~1/4 the
    fetches of the delay-1 host (equal queue depth, token_cap=1)."""
    from frontera_spark.core.frontier import FrontierEngine
    from frontera_spark.core.politeness import DomainMetadata, PoliteScheduler
    from frontera_spark.core.robots import policies_from_robots

    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=2)
    seeds = spark.createDataFrame(
        [(f"https://{h}/p{i}",) for h in ("fast.test", "slow.test") for i in range(12)],
        "url string",
    )
    assert eng.add_seeds(seeds) == 24
    dom = DomainMetadata(spark, str(tmp_path / "eng"), n_partitions=2, token_cap=1.0)
    dom.set_policies(
        policies_from_robots(
            spark,
            {
                "fast.test": "User-agent: *\nCrawl-delay: 1\n",
                "slow.test": "User-agent: *\nCrawl-delay: 4\n",
            },
        )
    )
    sched = PoliteScheduler(eng, dom, batch_period=1.0, token_cap=1.0)
    fetched = {"fast.test": 0, "slow.test": 0}
    for _ in range(8):  # 8 seconds of crawl clock
        batch = sched.pop(max_n=24)
        for r in batch.select("host").collect():
            fetched[r["host"]] += 1
    assert fetched["fast.test"] == 8  # one per second
    assert fetched["slow.test"] == 2  # one per 4 seconds


def test_crawlloop_robots_txt_single_knob(spark, tmp_path):
    """CrawlLoop(robots_txt={host: body}) derives the whole robots stack
    from raw robots.txt bodies: a full-ban host is never fetched, an RFC
    9309 wildcard Disallow gates matching paths at schedule time, and the
    remaining hosts crawl to exhaustion under the polite scheduler the
    knob turns on."""
    from frontera_spark import STATE_CRAWLED
    from frontera_spark.sources.corpus import url_of, write_corpus
    from frontera_spark.streaming.loop import CrawlLoop

    n_images, n_hosts = 40, 7
    corpus = str(tmp_path / "corpus")
    write_corpus(spark, corpus, n_images, n_hosts, 42)
    hosts = [f"h{h:03d}.example.test" for h in range(n_hosts)]
    robots = {h: "User-agent: *\nCrawl-delay: 0\n" for h in hosts}
    robots[hosts[1]] = "User-agent: *\nDisallow: /\n"  # bare full ban
    robots[hosts[2]] = "User-agent: *\nDisallow: /i/*7$\n"  # wildcard deny

    loop = CrawlLoop(
        spark,
        str(tmp_path / "eng"),
        corpus,
        corpus_seed=42,
        strategy="bfs",
        batch_size=16,
        n_partitions=1,
        mode="global",
        robots_txt=robots,
    )
    assert loop.scheduler is not None  # the knob turned politeness on
    loop.add_seeds([url_of(0, n_hosts)])
    hist = loop.run(max_iterations=40)

    crawled = {
        r["canonical_url"]
        for r in loop.engine.table.read()
        .filter(F.col("state") == STATE_CRAWLED)
        .collect()
    }
    assert len(crawled) > 10  # the allowed part of the graph was crawled
    assert sum(m["invariant_violations"] for m in hist) == 0
    assert not {u for u in crawled if hosts[1] in u}  # full ban held
    denied = {u for u in crawled if hosts[2] in u and u.endswith("7")}
    assert not denied  # wildcard '$'-anchored deny held
    # the wildcard rule only denied its pattern: host 2 URLs NOT ending in
    # 7 were still fetched (the rule is path-level, not a host ban)
    assert {u for u in crawled if hosts[2] in u}
