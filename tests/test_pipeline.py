"""Composed clean-corpus pipeline (operators/pipeline.py): stage wiring,
greedy-canonical dedup semantics, and scale shape (no cartesian product in
the near-dup plan)."""

import pytest
from pyspark.sql import functions as F

from frontera_spark.operators.pipeline import (
    clean_corpus,
    exact_dedup,
    minhash_lsh_pairs_for,
    neardup_dedup,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    """sf0.001 documents (500 rows, no internal exact dups) + one injected
    exact duplicate (doc 9001 = doc 3's text) + near-dup variants of docs
    < 20 (doc_id+1000, first token dropped — Jaccard (n-3)/(n-2))."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    exact_dup = base.filter(F.col("doc_id") == 3).select(
        F.lit(9001).cast("long").alias("doc_id"), "text"
    )
    toks = F.split(F.col("text"), r"\s+")
    variants = base.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 2, F.size(toks) - 1)).alias("text"),
    )
    return base.unionByName(exact_dup).unionByName(variants).cache()


def test_exact_dedup_keeps_lowest_id(docs):
    out = exact_dedup(docs)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 3 in ids and 9001 not in ids
    assert out.count() == docs.count() - 1  # only the injected dup collapses


def test_neardup_dedup_drops_only_higher_ids(docs):
    d1 = exact_dedup(docs)
    pairs = minhash_lsh_pairs_for(d1).collect()
    drop_expected = {r["b"] for r in pairs}
    assert drop_expected, "aug variants must produce at least one verified pair"
    # the injected variants (id ≥ 1000) pair with their originals and, having
    # the higher id, land on the drop side; the base corpus carries its own
    # near-dups too, so drop_expected is not ONLY variants
    variant_pairs = [r for r in pairs if r["b"] >= 1000]
    assert variant_pairs
    assert all(r["a"] < r["b"] for r in pairs)

    out = neardup_dedup(d1)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    base_ids = {r["doc_id"] for r in d1.select("doc_id").collect()}
    assert ids == base_ids - drop_expected
    # every variant's original survives as the canonical copy
    for r in variant_pairs:
        assert r["b"] - 1000 in ids or r["b"] - 1000 in drop_expected


def test_neardup_plan_has_no_cartesian(docs):
    plan = minhash_lsh_pairs_for(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_clean_corpus_stage_counts(docs):
    clean, counts = clean_corpus(
        docs, min_quality=0.0, langs=("en", "und", "de", "fr", "es")
    )
    assert counts["input"] == docs.count()
    assert counts["after_exact_dedup"] == counts["input"] - 1
    assert counts["after_neardup_dedup"] < counts["after_exact_dedup"]
    # permissive quality/lang gates pass everything through
    assert counts["after_quality_filter"] == counts["after_neardup_dedup"]
    assert counts["after_lang_filter"] == counts["after_quality_filter"]
    assert clean.count() == counts["after_lang_filter"]
    assert clean.columns == ["doc_id", "text", "quality", "lang_pred"]


def test_clean_corpus_quality_gate_monotone(docs):
    _, lo = clean_corpus(docs, min_quality=0.0, langs=("en",))
    _, hi = clean_corpus(docs, min_quality=0.95, langs=("en",))
    assert hi["after_quality_filter"] <= lo["after_quality_filter"]
    assert hi["after_quality_filter"] < hi["after_neardup_dedup"]


def test_neardup_components_chain(spark):
    """A~B~C chains collapse to one component labeled by the min id, even
    when A and C never share a pair; disjoint pairs stay separate."""
    from frontera_spark.operators.pipeline import neardup_components

    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (3, 4, 0.7), (10, 11, 0.95), (20, 21, 0.9), (21, 22, 0.9)],
        "a long, b long, jaccard double",
    )
    out = {r["doc_id"]: r["component"] for r in neardup_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_neardup_components_paths_agree(spark):
    """The size-adaptive switch must be invisible: the driver-side
    union-find (small edge sets) and the distributed pointer-jump loop
    (driver_threshold=0 forces it) return identical labelings — including
    on a long chain, where the pointer jump needs multiple rounds."""
    from frontera_spark.operators.pipeline import neardup_components

    chain = [(i, i + 1, 0.9) for i in range(50)]  # one 51-node chain
    extra = [(100, 200, 0.9), (200, 150, 0.9), (300, 301, 0.9)]
    pairs = spark.createDataFrame(chain + extra, "a long, b long, jaccard double")
    fast = {r["doc_id"]: r["component"] for r in neardup_components(pairs).collect()}
    dist = {
        r["doc_id"]: r["component"]
        for r in neardup_components(pairs, driver_threshold=0).collect()
    }
    assert fast == dist
    assert fast[50] == 0 and fast[150] == 100 and fast[301] == 300
