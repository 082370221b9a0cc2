"""Round-4 crawl-tier operators: trap detection, adaptive revisit, sitemaps."""

import pyspark.sql.functions as F
import pytest

from frontera_spark.core.revisit import change_rate_schedule
from frontera_spark.core.traps import url_alias_stats, url_template
from frontera_spark.functions.sitemaps import extract_locs


# ------------------------------------------------------------------ traps


def test_url_template_folds_digits_and_strips_query(spark):
    df = spark.createDataFrame(
        [
            ("https://h3.example.test/d/123?sid=99#frag",),
            ("https://h3.example.test/d/7",),
            ("https://h3.example.test/cal/2026/08/18",),
        ],
        "url string",
    )
    got = [r[0] for r in df.select(url_template(F.col("url"))).collect()]
    assert got == [
        "https://hN.example.test/d/N",
        "https://hN.example.test/d/N",
        "https://hN.example.test/cal/N/N/N",
    ]


def test_trap_detector_flags_aliasing_host_only(spark):
    rows = []
    # benign: 10 contents, 1 URL each
    for i in range(10):
        rows.append(("good.test", i, f"https://good.test/d/{i}"))
    # trap: 4 contents, 5 URL aliases each (session ids)
    for i in range(4):
        for s in range(5):
            rows.append(("trap.test", i, f"https://trap.test/d/{i}?sid={s}"))
    df = spark.createDataFrame(rows, "host string, content_key long, url string")
    got = {r["host"]: r.asDict() for r in url_alias_stats(df).collect()}
    assert not got["good.test"]["is_trap"]
    assert got["good.test"]["alias_ratio"] == 1.0
    assert got["trap.test"]["is_trap"]
    assert got["trap.test"]["alias_ratio"] == 5.0
    assert got["trap.test"]["n_templates"] == 1
    assert got["trap.test"]["template_fanout"] == 20.0


# ------------------------------------------------------------------ revisit


def test_change_rate_schedule_exact_math(spark):
    # page 1: changes at t=0s, 10s, 30s -> span 30s, mean gap 15s,
    # rate = 2 changes / 30 s = 5760/day; next due at 30s + 15s = 45s.
    # page 2: single observation -> dropped. page 3: two equal ts -> dropped.
    df = spark.createDataFrame(
        [
            (1, "1970-01-01 00:00:00"),
            (1, "1970-01-01 00:00:10"),
            (1, "1970-01-01 00:00:30"),
            (2, "1970-01-01 00:01:00"),
            (3, "1970-01-01 00:02:00"),
            (3, "1970-01-01 00:02:00"),
        ],
        "page_id long, ts string",
    ).select("page_id", F.col("ts").cast("timestamp").alias("ts"))
    rows = change_rate_schedule(df).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["page_id"] == 1
    assert r["n_changes"] == 3
    assert r["last_us"] == 30_000_000
    assert r["rate_per_day"] == pytest.approx(5760.0)
    assert r["next_due_us"] == 45_000_000


def test_change_rate_integral_gap_division(spark):
    # span 7s over 2 gaps -> mean gap 3.5s, integral div -> 3_500_000 us
    # exactly (no float round-trip): next due = 7s + 3.5s = 10.5s.
    df = spark.createDataFrame(
        [(1, 0), (1, 3_000_000), (1, 7_000_000)],
        "page_id long, us long",
    ).select(
        "page_id",
        F.expr("timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01 00:00:00')").alias("ts"),
    )
    r = change_rate_schedule(df).collect()[0]
    assert r["next_due_us"] == 10_500_000


# ------------------------------------------------------------------ sitemaps


def test_extract_locs_trims_and_counts(spark):
    xml = (
        "<urlset><url><loc> https://a.test/1 </loc></url>"
        "<url><loc>https://a.test/2</loc></url>"
        "<url><loc>\n  https://a.test/3\n</loc></url></urlset>"
    )
    df = spark.createDataFrame([("a.test", xml)], "host string, sitemap_xml string")
    rows = extract_locs(df).collect()
    assert [r["url"] for r in rows] == [
        "https://a.test/1",
        "https://a.test/2",
        "https://a.test/3",
    ]
    assert all(r["n_locs"] == 3 for r in rows)
    assert rows[0].asDict().keys() == {"host", "n_locs", "url"}


def test_extract_locs_empty_sitemap_yields_no_rows(spark):
    df = spark.createDataFrame(
        [("empty.test", "<urlset></urlset>")], "host string, sitemap_xml string"
    )
    assert extract_locs(df).count() == 0


# ------------------------------------------------------------------ OPIC


def test_opic_conserves_cash_and_banks_history(spark):
    """Invariants of the batch-synchronous OPIC: total cash stays 1.0 every
    round (dangling cash redistributes, never evaporates) and sum(history)
    after round t equals exactly t (each round banks the previous round's
    total cash); importance therefore sums to 1."""
    from frontera_spark.operators.pipeline import opic

    # ring + one dangling node: 0->1->2->3->0, node 4 dangling (out-deg 0)
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1)], "src long, dst long, outdeg int"
    )
    frames = opic(nodes, edges, n=5, iterations=3, return_all=True)
    for t, fr in enumerate(frames, start=1):
        cash_sum, hist_sum = fr.agg(F.sum("cash"), F.sum("hist")).first()
        assert cash_sum == pytest.approx(1.0, abs=1e-6), f"cash leaked at round {t}"
        assert hist_sum == pytest.approx(float(t), abs=1e-6), f"history wrong at round {t}"

    out = opic(nodes, edges, n=5, iterations=3)
    assert out.agg(F.sum("importance")).first()[0] == pytest.approx(1.0, abs=1e-6)
    # the dangling node receives only redistributed cash and never banks
    # incoming edges -> strictly the lowest importance
    imp = {r["id"]: r["importance"] for r in out.collect()}
    assert imp[4] == min(imp.values())


# --------------------------------------------------------- trap budget guard


def test_engine_trap_detection_and_pop_caps(spark, tmp_path):
    from frontera_spark.core.frontier import FrontierEngine

    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=2, strategy="fifo")
    rows = [(f"https://trap.test/d/{i}", i) for i in range(40)]  # ONE template
    rows += [(f"https://good.test/{chr(97 + i)}/x", 100 + i) for i in range(10)]
    eng.add_seeds(spark.createDataFrame(rows, "url string, seq int"))

    hot = eng.detect_trap_hosts(fanout_threshold=10.0)
    assert set(hot) == {"trap.test"}
    assert hot["trap.test"] == 40.0

    batch = eng.get_next_requests(100, mode="global", host_caps={"trap.test": 5})
    by_host = {
        r["host"]: r["n"]
        for r in batch.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    batch.unpersist()
    # the trap host is budget-capped; the uncapped host drains fully
    assert by_host == {"trap.test": 5, "good.test": 10}


def test_engine_host_caps_combine_with_max_per_host(spark, tmp_path):
    from frontera_spark.core.frontier import FrontierEngine

    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=2, strategy="fifo")
    rows = [(f"https://a.test/d/{i}", i) for i in range(20)]
    rows += [(f"https://b.test/d/{i}", 100 + i) for i in range(20)]
    eng.add_seeds(spark.createDataFrame(rows, "url string, seq int"))
    batch = eng.get_next_requests(
        100, mode="global", max_per_host=8, host_caps={"a.test": 3}
    )
    by_host = {
        r["host"]: r["n"]
        for r in batch.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    batch.unpersist()
    # a.test takes min(8, 3), b.test the plain max_per_host
    assert by_host == {"a.test": 3, "b.test": 8}


def test_crawl_loop_trap_guard_completes(spark, tmp_path):
    """Guarded loop still crawls the whole corpus: the trap cap throttles the
    hot host per pop (the synthetic corpus folds each host's URLs onto one
    /i/imgN template, so a low threshold flags the 30%-share hot host) but
    never drops work — completion, not ordering, is the contract with the
    guard on."""
    from frontera_spark.sources.corpus import url_of, write_corpus
    from frontera_spark.streaming.loop import CrawlLoop

    corpus_path = str(tmp_path / "corpus")
    write_corpus(spark, corpus_path, 40, 7, 42)
    loop = CrawlLoop(
        spark,
        str(tmp_path / "eng"),
        corpus_path,
        corpus_seed=42,
        strategy="bfs",
        batch_size=16,
        n_partitions=1,
        mode="global",
        trap_guard={"every": 1, "fanout_threshold": 8.0, "cap": 4},
    )
    loop.add_seeds([url_of(0, 7)])
    hist = loop.run()
    assert sum(m["n_fetched"] for m in hist) == 40
    assert sum(m["invariant_violations"] for m in hist) == 0


def test_add_seeds_sitemaps_schedules_and_dedups(spark, tmp_path):
    from frontera_spark.core.frontier import FrontierEngine

    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=2, strategy="fifo")
    xml1 = (
        "<urlset><url><loc>https://a.test/1</loc></url>"
        "<url><loc> https://a.test/2 </loc></url></urlset>"
    )
    xml2 = "<urlset><url><loc>https://b.test/1</loc></url></urlset>"
    sm = spark.createDataFrame([(xml1,), (xml2,)], "sitemap_xml string")
    assert eng.add_seeds_sitemaps(sm) == 3
    # re-offering the same sitemaps is a no-op (seen-set dedup)
    assert eng.add_seeds_sitemaps(sm) == 0
    urls = {r["canonical_url"] for r in eng.table.read().collect()}
    assert urls == {"https://a.test/1", "https://a.test/2", "https://b.test/1"}
