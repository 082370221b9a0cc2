"""Round-3 fix pins: narrow UPDATE merges, pushdown-preserving queued scans,
overlay keying, settings env validation, pandas_order type validation, and
the short-doc MinHash parity case from ADVICE r2."""

import duckdb
import pytest
from pyspark.sql import functions as F

from frontera_spark import STATE_CRAWLED, STATE_QUEUED
from frontera_spark.core.frontier import FrontierEngine
from frontera_spark.plans.snapshot import SnapshotTable


# --------------------------------------------------- narrow UPDATE-only merge


def _mk_table(spark, path):
    t = SnapshotTable.create(
        spark, str(path), "k long, v string, n int, partition_id int", key=["k"]
    )
    t.upsert(
        spark.createDataFrame(
            [(i, f"v{i}", 0, i % 2) for i in range(6)],
            "k long, v string, n int, partition_id int",
        )
    )
    return t


def test_upsert_accepts_narrow_update_source(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t")
    # key + set_cols only — no v column, no reconstruction join needed
    narrow = spark.createDataFrame([(1, 7, 1), (3, 9, 1)], "k long, n int, partition_id int")
    t.upsert(narrow, set_cols=["n"], insert=False)
    rows = {r["k"]: (r["v"], r["n"]) for r in t.read().collect()}
    assert rows[1] == ("v1", 7) and rows[3] == ("v3", 9)
    assert rows[0] == ("v0", 0) and rows[2] == ("v2", 0)  # untouched


def test_upsert_narrow_source_missing_column_raises(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t")
    bad = spark.createDataFrame([(1, 1)], "k long, partition_id int")
    with pytest.raises(ValueError, match="missing"):
        t.upsert(bad, set_cols=["n"], insert=False)


def test_narrow_update_against_empty_partition_is_noop(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k long, v string, n int, partition_id int", key=["k"]
    )
    narrow = spark.createDataFrame([(1, 7, 0)], "k long, n int, partition_id int")
    t.upsert(narrow, set_cols=["n"], insert=False)
    assert t.read().count() == 0


def test_mark_runs_narrow_merge(spark, tmp_path):
    """page_crawled feeds upsert a 3-column source; state lands, url survives."""
    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=4)
    eng.add_seeds(spark.createDataFrame(
        [(f"https://h{i}.test/a?x=1&y=2",) for i in range(8)], "url string"
    ))
    batch = eng.get_next_requests(8, mode="per_partition")
    eng.page_crawled(batch.select("fingerprint", "partition_id", "jid"))
    done = eng.table.read().filter(F.col("state") == STATE_CRAWLED)
    assert done.count() == 8
    # non-set columns untouched by the narrow merge
    assert done.filter(F.col("canonical_url").isNull()).count() == 0


# --------------------------------- pushdown-preserving queued scan under marks


def test_queued_scan_matches_overlay_semantics(spark, tmp_path):
    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=4)
    eng.add_seeds(spark.createDataFrame(
        [(f"https://h{i % 5}.test/p{i}",) for i in range(20)], "url string"
    ))
    popped = eng.get_next_requests(2, mode="per_partition")  # leaves live marks
    n_popped = popped.count()
    assert eng.table.manifest().get("marks"), "pop should leave live marks"
    # overlay formulation (filter above the mark join) == base+anti-join scan
    overlay = eng.table.read().filter(
        (F.col("state") == STATE_QUEUED) & F.col("batch_id").isNull()
    )
    fast = eng._queued_scan(None)
    assert fast.count() == overlay.count() == 20 - n_popped
    assert (
        sorted(r["fingerprint"] for r in fast.select("fingerprint").collect())
        == sorted(r["fingerprint"] for r in overlay.select("fingerprint").collect())
    )


def test_queued_scan_pushes_filters_with_live_marks(spark, tmp_path):
    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=4)
    eng.add_seeds(spark.createDataFrame(
        [(f"https://h{i % 5}.test/p{i}",) for i in range(20)], "url string"
    ))
    eng.get_next_requests(2, mode="per_partition")
    assert eng.table.manifest().get("marks")
    plan = eng._queued_scan(1)._jdf.queryExecution().executedPlan().toString()
    # state/batch_id predicates reach the parquet scan even with marks live
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("state" in ln and "batch_id" in ln for ln in pushed), plan


def test_overlay_mark_keyed_by_partition(spark, tmp_path):
    """Same key value in two partitions: a mark on one must not leak."""
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k long, b long, partition_id int", key=["k"]
    )
    t.upsert(spark.createDataFrame(
        [(1, None, 0), (1, None, 1)], "k long, b long, partition_id int"
    ))
    t.add_marks(
        spark.createDataFrame([(1, 5, 0)], "k long, b long, partition_id int"),
        mark_cols=["b"],
    )
    rows = {r["partition_id"]: r["b"] for r in t.read().collect()}
    assert rows[0] == 5 and rows[1] is None


# ----------------------------------------------------- settings env validation


def test_env_override_wrong_type_fails_loudly(monkeypatch):
    from frontera_spark.settings import Settings

    monkeypatch.setenv("FRONTERA_SPARK_MAX_NEXT_REQUESTS", "abc")
    with pytest.raises(ValueError, match="FRONTERA_SPARK_MAX_NEXT_REQUESTS"):
        Settings()
    monkeypatch.setenv("FRONTERA_SPARK_MAX_NEXT_REQUESTS", "[1, 2]")
    with pytest.raises(ValueError, match="MAX_NEXT_REQUESTS"):
        Settings()


def test_env_override_valid_types_coerce(monkeypatch):
    from frontera_spark.settings import DEFAULT_SETTINGS, Settings

    monkeypatch.setenv("FRONTERA_SPARK_MAX_NEXT_REQUESTS", "512")
    s = Settings()
    assert s.MAX_NEXT_REQUESTS == 512
    # bool default must reject a bare int and accept true/false
    bool_keys = [k for k, v in DEFAULT_SETTINGS.items() if isinstance(v, bool)]
    if bool_keys:
        monkeypatch.setenv(f"FRONTERA_SPARK_{bool_keys[0]}", "1")
        with pytest.raises(ValueError):
            Settings()
        monkeypatch.setenv(f"FRONTERA_SPARK_{bool_keys[0]}", "true")
        assert getattr(Settings(), bool_keys[0]) is True


# ------------------------------------------------ pandas_order type validation


def test_custom_strategy_nonintegral_order_rejected(spark, tmp_path):
    from frontera_spark.core.politeness import DomainMetadata, PoliteScheduler
    from frontera_spark.core.strategies import CustomStrategy

    bad = CustomStrategy(
        name="bad_order",
        ordering_fn=lambda it: [F.asc("seq")],
        pandas_order_fn=lambda it: (F.col("score"), F.col("seq")),  # score: double
    )
    eng = FrontierEngine(spark, str(tmp_path / "eng"), n_partitions=2, strategy=bad)
    eng.add_seeds(spark.createDataFrame([("https://a.test/x",)], "url string"))
    domains = DomainMetadata(spark, str(tmp_path / "dom"), n_partitions=2)
    sched = PoliteScheduler(eng, domains)
    with pytest.raises(TypeError, match="integral"):
        sched.decide(1, 8)


# -------------------------------------------------- parameterized phash banding


def test_phash_banding_configs_agree(spark):
    """Pigeonhole guarantee: the verified pair set is identical at any chunk
    count > hamming_max — only the candidate buckets differ."""
    from frontera_spark.operators.pipeline import (
        phash_bucket_stats,
        phash_neardup_pairs_for,
    )

    ph = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("phash"),
    )
    # inject guaranteed near-dups: xor with 2 bits
    ph = ph.unionByName(
        ph.filter(F.col("doc_id") < 40).select(
            (F.col("doc_id") + 1000).alias("doc_id"),
            F.col("phash").bitwiseXOR(F.lit(3)).alias("phash"),
        )
    )
    base = {tuple(r) for r in phash_neardup_pairs_for(ph, n_chunks=4).collect()}
    alt8 = {tuple(r) for r in phash_neardup_pairs_for(ph, n_chunks=8).collect()}
    alt16 = {tuple(r) for r in phash_neardup_pairs_for(ph, n_chunks=16).collect()}
    assert base == alt8 == alt16
    assert len(base) >= 40
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_neardup_pairs_for(ph, n_chunks=2, hamming_max=3)
    with pytest.raises(ValueError, match="divide"):
        phash_neardup_pairs_for(ph, n_chunks=5)
    stats = phash_bucket_stats(ph, n_chunks=8).collect()
    assert len(stats) == 8
    assert all(r["max_bucket"] >= 1 and r["cand_pairs"] >= 0 for r in stats)


# ------------------------------------------------------- public-suffix parsing


def test_public_suffix_mode_golden():
    from frontera_spark.functions.urls import parse_domain_info

    cases = {
        "https://www.example.co.uk/p": ("example.co.uk", "co.uk", "www"),
        "http://shop.foo.com.au:8080/x": ("foo.com.au", "com.au", "shop"),
        "https://a.b.gov.br/": ("b.gov.br", "gov.br", "a"),
        # bare registrable domain: no subdomain
        "https://example.co.jp/": ("example.co.jp", "co.jp", ""),
        # the suffix ITSELF as host: fall back to positional (no registrable part)
        "https://co.uk/": ("co.uk", "uk", ""),
        # non-listed host: identical to the positional heuristic
        "https://www.example.com/": ("example.com", "com", "www"),
    }
    for url, (sld, tld, sub) in cases.items():
        d = parse_domain_info(url, public_suffix=True)
        assert (d["sld"], d["tld"], d["subdomain"]) == (sld, tld, sub), url


def test_default_heuristic_unchanged():
    from frontera_spark.functions.urls import parse_domain_info

    d = parse_domain_info("https://www.example.co.uk/p")
    assert (d["sld"], d["tld"], d["subdomain"]) == ("co.uk", "uk", "www.example")
    d1 = parse_domain_info("https://localhost/")
    assert (d1["sld"], d1["tld"]) == ("localhost", "")


def test_public_suffix_udf(spark):
    from frontera_spark.functions.urls import parse_domains_udf_for

    df = spark.createDataFrame(
        [("https://www.example.co.uk/p",), ("https://x.example.com/",)], "url string"
    ).withColumn("d", parse_domains_udf_for(public_suffix=True)(F.col("url")))
    rows = {r["d"]["sld"]: r["d"]["tld"] for r in df.collect()}
    assert rows == {"example.co.uk": "co.uk", "example.com": "com"}


# ---------------------------------------------- short-doc MinHash parity (ADVICE)


def test_minhash_short_docs_match_oracle(spark):
    """Docs with exactly 3 tokens / heavily repeated shingles must be banded
    identically by Spark and the DuckDB oracle (ADVICE r2: the old n_sh >= 3
    filter silently dropped them on the Spark side only)."""
    from frontera_spark.operators.pipeline import minhash_lsh_pairs_for

    docs = [
        (1, "alpha beta gamma"),              # 3 tokens → 1 shingle
        (2, "alpha beta gamma"),              # exact dup of 1
        (3, "go go go go"),                   # repeated shingles → 1 distinct
        (4, "go go go go go go"),             # same single distinct shingle
        (5, "one two"),                       # <3 tokens → not banded
        (6, "one two"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["a"], r["b"], r["jaccard"])
        for r in minhash_lsh_pairs_for(sdf, jaccard_min=0.6).collect()
    }

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") AS t(doc_id, text)"
    )
    from frontera_spark.operators.driver_queries import SQL_MINHASH_LSH_PAIRS, _AUG_DOCS_SQL

    sql = SQL_MINHASH_LSH_PAIRS.replace(_AUG_DOCS_SQL, " SELECT doc_id, text FROM d ")
    want = {(r[0], r[1], r[2]) for r in con.sql(sql).fetchall()}
    assert got == want
    assert (1, 2, 1.0) in got and (3, 4, 1.0) in got  # short docs ARE banded


# ------------------------------------------- ANN / near-dup recall (VERDICT 5+6)

SF001 = "/root/testdata/sf0.01"


def test_multiband_lsh_neardup_recall(spark):
    """VERDICT r2 #6: the multi-band (16×3) embedding LSH must recover ≥0.9
    of the brute-force cos≥0.3 pair set. Deterministic: fixed md5 planes,
    fixed data."""
    from frontera_spark.operators.driver_queries import (
        q_embed_neardup_pairs,
        q_lsh_neardup_pairs,
    )

    truth = {(r.a, r.b) for r in q_embed_neardup_pairs(spark, SF001).collect()}
    assert truth, "brute-force truth set empty — data changed?"
    lsh = {
        (r.a, r.b)
        for r in q_lsh_neardup_pairs(spark, SF001).collect()
        if r.a < 100 and r.b < 100  # brute set is capped at vec_id < 100
    }
    recall = len(lsh & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9 ({len(lsh & truth)}/{len(truth)})"
    # precision is exact by construction: every emitted pair is verified
    assert lsh <= truth


def test_ivf_centroids_trained_and_recall(spark):
    """VERDICT r2 #5: IVF centroids come from deterministic Lloyd's, not the
    raw first-8-vectors init, and the cell-probe top-10 keeps useful recall
    vs the brute-force scan."""
    from frontera_spark.operators.driver_queries import (
        _IVF_K,
        _ivf_train,
        q_embed_topk,
        q_ivf_topk,
    )
    from frontera_spark.operators.driver_queries import _t as _table

    emb = _table(spark, SF001, "embeddings")
    sample = [
        list(r.v)
        for r in emb.filter(F.col("vec_id") < 256)
        .orderBy("vec_id")
        .selectExpr("transform(embedding, x -> cast(x as double)) as v")
        .collect()
    ]
    cents = _ivf_train(sample)
    assert len(cents) == _IVF_K
    # training moved every centroid off its init vector
    moved = sum(1 for cid in range(_IVF_K) if cents[cid] != sample[cid])
    assert moved == _IVF_K
    # centroid components all carry the 1e-4 rounding grid (parity barrier)
    for c in cents:
        for x in c:
            assert abs(x * 10000.0 - round(x * 10000.0)) < 1e-9

    brute = {r.vec_id for r in q_embed_topk(spark, SF001).collect()}
    ivf = {r.vec_id for r in q_ivf_topk(spark, SF001).collect()}
    assert len(brute & ivf) / 10 >= 0.6  # measured 0.7 at sf0.01, 1.0 at sf0.1


# ------------------------------------------------- distributed k-means (IVF)


def test_kmeans_fit_matches_driver_side_trainer(spark):
    """pipeline.kmeans_fit (distributed Lloyd's — corpus never collected) and
    driver_queries._ivf_train (sample-bounded, oracle-replayable) implement
    the SAME contract; on the same input they must produce the same
    centroids. The HALF_UP-1e-4 barrier on every dot and mean absorbs the
    engines' different float-summation orders."""
    from frontera_spark.operators.driver_queries import _ivf_train, _IVF_K
    from frontera_spark.operators.driver_queries import _t as _table
    from frontera_spark.operators.pipeline import kmeans_assign, kmeans_fit

    emb = _table(spark, SF001, "embeddings")
    vecs = emb.filter(F.col("vec_id") < 256).selectExpr(
        "vec_id", "transform(embedding, x -> cast(x as double)) as v"
    )
    sample = [list(r.v) for r in vecs.orderBy("vec_id").collect()]
    want = _ivf_train(sample)

    got = kmeans_fit(vecs, k=_IVF_K, iterations=3)
    assert len(got) == len(want)
    for cid, (g, w) in enumerate(zip(got, want)):
        assert g == pytest.approx(w, abs=1e-9), f"centroid {cid} diverged"

    asgn = kmeans_assign(vecs, got)
    cells = {r["cell"] for r in asgn.select("cell").distinct().collect()}
    assert cells <= set(range(_IVF_K)) and len(cells) >= 2
    assert asgn.count() == vecs.count()


def test_kmeans_fit_validates_inputs(spark):
    from frontera_spark.operators.pipeline import kmeans_fit

    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, v array<double>"
    )
    with pytest.raises(ValueError, match="only 2 vectors"):
        kmeans_fit(vecs, k=5)
    with pytest.raises(ValueError, match="k >= 1"):
        kmeans_fit(vecs, k=0)
