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
