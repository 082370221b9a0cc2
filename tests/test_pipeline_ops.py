"""Corpus-hygiene operators (operators/pipeline.py): segment dedup,
contamination scan, PII redaction — edge cases the sf-corpus can't pin
(short docs, synthetic PII strings, exact hit counts)."""

import pytest
from pyspark.sql import functions as F

from frontera_spark.operators.pipeline import (
    PII_PATTERNS,
    ngram_contamination,
    redact_col,
    segment_dedup_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_segment_dedup_counts_and_short_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d x y z w"),      # segs: "a b c d", "x y z w"
            (2, "a b c d q q q q"),      # shares "a b c d"
            (3, "a b c d a b c d"),      # "a b c d" twice, but one doc only
            (4, "too short"),             # < k tokens → no segments
        ],
    )
    rows = {r["seg"]: (r["n_docs"], r["n_occ"]) for r in segment_dedup_stats(docs, k=4).collect()}
    assert rows == {"a b c d": (3, 4)}  # 3 distinct docs, 4 occurrences


def test_segment_dedup_truncates_tail_tokens(spark):
    # 6 tokens at k=4 → exactly one segment (tail "e f" dropped), so two
    # docs sharing only their tails are NOT flagged
    docs = _docs(spark, [(1, "a b c d e f"), (2, "q r s t e f")])
    assert segment_dedup_stats(docs, k=4).count() == 0


def test_ngram_contamination_hits(spark):
    # doc 0 (0 % 97 == 0) is eval; doc 1 shares two distinct 4-grams with it
    # ("a b c d" and "b c d e"), doc 2 shares none, doc 97*2=194 is eval too
    docs = _docs(
        spark,
        [
            (0, "a b c d e"),
            (1, "x a b c d e"),
            (2, "p q r s t u"),
            (194, "p q r s"),
        ],
    )
    got = {r["doc_id"]: r["n_hits"] for r in ngram_contamination(docs, n=4).collect()}
    assert got == {1: 2, 2: 1}  # doc 2 matches eval doc 194's "p q r s"


def test_ngram_contamination_counts_distinct_grams_once(spark):
    # the same contaminated gram repeated in a training doc counts once
    docs = _docs(spark, [(0, "a b c d"), (1, "a b c d a b c d")])
    got = ngram_contamination(docs, n=4).collect()
    assert [(r["doc_id"], r["n_hits"]) for r in got] == [(1, 1)]


@pytest.mark.parametrize(
    "dirty, clean_part",
    [
        ("contact me at jane.doe+x@example.co.uk please", "contact me at"),
        ("call +1 415-555-2671 now", "call"),
        ("server at 10.0.42.7 responded", "server at"),
    ],
)
def test_redact_col_masks_pii(spark, dirty, clean_part):
    out = (
        spark.range(1)
        .select(redact_col(F.lit(dirty)).alias("t"))
        .first()["t"]
    )
    assert "[REDACTED]" in out and clean_part in out
    assert "jane.doe" not in out and "415-555" not in out and "10.0.42.7" not in out


def test_redact_col_leaves_clean_text(spark):
    s = "the quick brown fox version two"
    out = spark.range(1).select(redact_col(F.lit(s)).alias("t")).first()["t"]
    assert out == s
    assert set(PII_PATTERNS) == {"email", "phone", "ipv4"}
