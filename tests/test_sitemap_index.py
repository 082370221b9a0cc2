"""Sitemap-INDEX recursion (VERDICT r4 next #6): <sitemap><loc> index files
resolve to child sitemaps, whose URL sets are scheduled, deduped, and
deterministically ordered — pinning the path add_seeds_sitemaps' docstring
promises one level up (frontera analog: Scrapy SitemapSpider's index
handling; frontera itself only takes flat seed lists, utils/add_seeds.py).
"""

from pyspark.sql import functions as F

from frontera_spark import STATE_QUEUED
from frontera_spark.core.frontier import FrontierEngine

H = "https://h0.example.test"
S = "https://sitemaps.example.test"


def _urlset(*urls):
    body = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
    return f'<?xml version="1.0"?><urlset>{body}</urlset>'


def _index(*sitemap_urls):
    body = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in sitemap_urls)
    return f'<?xml version="1.0"?><sitemapindex>{body}</sitemapindex>'


def test_sitemap_index_resolves_children_in_order(spark, tmp_path):
    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=2, strategy="bfs")
    # child 2 listed FIRST in the index; /shared appears in both children
    idx = spark.createDataFrame(
        [(_index(f"{S}/sm2.xml", f"{S}/sm1.xml", f"{S}/missing.xml"),)],
        "sitemap_xml string",
    )
    docs = spark.createDataFrame(
        [
            (f"{S}/sm1.xml", _urlset(f"{H}/a1", f"{H}/shared")),
            (f"{S}/sm2.xml", _urlset(f"{H}/b1", f"{H}/b2", f"{H}/shared")),
            # unrelated sitemap in the doc table: must NOT be scheduled
            (f"{S}/other.xml", _urlset(f"{H}/nope")),
        ],
        "url string, sitemap_xml string",
    )
    # 4 unique URLs: b1, b2, shared (via sm2, listed first), a1; missing.xml
    # has no document and is skipped
    assert eng.add_seeds_sitemap_index(idx, docs) == 4
    rows = eng.table.read().orderBy("seq").select("canonical_url", "state").collect()
    assert [r.canonical_url for r in rows] == [
        f"{H}/b1", f"{H}/b2", f"{H}/shared", f"{H}/a1",
    ]
    assert all(r.state == STATE_QUEUED for r in rows)
    # re-offering the index is a no-op (seen-set dedup)
    assert eng.add_seeds_sitemap_index(idx, docs) == 0


def test_sitemap_index_two_levels_via_second_call(spark, tmp_path):
    """Deeper nesting = the same call again on the next level's documents
    (the 'feed it back through the loop' contract)."""
    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=1, strategy="bfs")
    root = spark.createDataFrame(
        [(_index(f"{S}/mid.xml"),)], "sitemap_xml string"
    )
    docs = spark.createDataFrame(
        [
            # mid.xml is itself an index: its <loc>s are sitemap URLs
            (f"{S}/mid.xml", _index(f"{S}/leaf.xml")),
            (f"{S}/leaf.xml", _urlset(f"{H}/deep1", f"{H}/deep2")),
        ],
        "url string, sitemap_xml string",
    )
    # level 1: root -> mid.xml; mid's <loc> bodies are sitemap URLs, which
    # the seed path schedules as ordinary URLs — filter them back out as the
    # next level's index set instead of crawling them
    from frontera_spark.functions.sitemaps import loc_urls

    mid = docs.join(
        root.select(F.explode(loc_urls(F.col("sitemap_xml"))).alias("u")),
        F.col("url") == F.col("u"),
        "left_semi",
    )
    assert eng.add_seeds_sitemap_index(mid, docs) == 2
    got = {r.canonical_url for r in eng.table.read().collect()}
    assert got == {f"{H}/deep1", f"{H}/deep2"}


# --------------- robots.txt 'Sitemap:' directive bootstrap -----------------


def test_parse_sitemap_urls():
    from frontera_spark.core.robots import parse_sitemap_urls

    txt = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Sitemap: https://a.test/sitemap.xml\n"
        "\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
        "sitemap: https://a.test/sm2.xml  # trailing comment\n"
        "Sitemap:\n"  # empty value: skipped
    )
    # group-independent: both directives apply regardless of agent groups
    assert parse_sitemap_urls(txt) == [
        "https://a.test/sitemap.xml",
        "https://a.test/sm2.xml",
    ]
    assert parse_sitemap_urls("User-agent: *\nDisallow: /\n") == []


def test_add_seeds_robots_sitemap_directives(spark, tmp_path):
    """Frontier bootstrap from robots.txt: advertised sitemaps resolve
    against the fetched document table; un-advertised and un-fetched
    sitemaps are skipped; dedup + deterministic order as any seed path."""
    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=2, strategy="bfs")
    robots = {
        "h0.example.test": (
            f"User-agent: *\nDisallow: /private/\nSitemap: {S}/sm1.xml\n"
        ),
        "h1.example.test": f"Sitemap: {S}/sm2.xml\nSitemap: {S}/gone.xml\n",
        "h2.example.test": "User-agent: *\nDisallow: /\n",  # no directive
    }
    docs = spark.createDataFrame(
        [
            (f"{S}/sm1.xml", _urlset(f"{H}/a1", f"{H}/shared")),
            (f"{S}/sm2.xml", _urlset(f"{H}/b1", f"{H}/shared")),
            # fetched but NOT advertised by any robots.txt: must not seed
            (f"{S}/other.xml", _urlset(f"{H}/nope")),
        ],
        "url string, sitemap_xml string",
    )
    assert eng.add_seeds_robots(robots, docs) == 3  # a1, shared, b1 deduped
    urls = {r.canonical_url for r in eng.table.read().collect()}
    assert urls == {f"{H}/a1", f"{H}/shared", f"{H}/b1"}
    # idempotent re-offer; empty directive set is a clean 0
    assert eng.add_seeds_robots(robots, docs) == 0
    assert eng.add_seeds_robots({"h9.test": "User-agent: *\n"}, docs) == 0
