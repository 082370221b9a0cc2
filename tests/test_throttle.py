"""AIMD politeness throttle (core/throttle.py — AutoThrottle analog):
controller-expression goldens, and the crawl-loop e2e — a host that keeps
failing has its politeness delay multiplied into the domain table while a
healthy host's delay relaxes toward the floor."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from frontera_spark.core.throttle import aimd_delay
from frontera_spark.sources.corpus import url_of, write_corpus
from frontera_spark.streaming.loop import CrawlLoop

# ------------------------------------------------------------ expression unit

CASES = [
    # (delay, n_ok, n_err, expected) with default knobs:
    # err_threshold=0.5, backoff=2.0, relief_s=0.5, min 0.0, max 60.0
    (4.0, 0, 0, 4.0),      # empty window: hold (not popped != healthy)
    (0.0, 1, 3, 0.5),      # troubled at zero: kick up to relief_s
    (4.0, 1, 1, 8.0),      # err rate 0.5 hits the threshold: double
    (40.0, 0, 5, 60.0),    # doubling capped at max_delay_s
    (4.0, 9, 1, 3.5),      # healthy: relax additively
    (0.25, 5, 0, 0.0),     # relaxation floored at min_delay_s
]


def test_aimd_golden(spark):
    df = spark.createDataFrame(
        [(float(d), o, e) for d, o, e, _ in CASES],
        "delay_s double, n_ok long, n_err long",
    )
    got = [
        r["new"]
        for r in df.select(
            aimd_delay(F.col("delay_s"), F.col("n_ok"), F.col("n_err")).alias("new")
        ).collect()
    ]
    assert got == [exp for *_, exp in CASES]


def test_aimd_knobs(spark):
    df = spark.createDataFrame([(2.0, 1, 9)], "delay_s double, n_ok long, n_err long")
    got = df.select(
        aimd_delay(
            F.col("delay_s"), F.col("n_ok"), F.col("n_err"),
            backoff=3.0, max_delay_s=5.0,
        ).alias("new")
    ).head()["new"]
    assert got == 5.0  # 2*3 capped at 5


# ------------------------------------------------------------------ loop e2e

N, HOSTS, SEED = 30, 3, 42
POLICY_SCHEMA = "host string, robots_allow boolean, delay_s double, budget long"


def _hosts_in(spark, corpus_path):
    return sorted(
        r["h"]
        for r in spark.read.parquet(corpus_path)
        .select(F.regexp_extract("url", r"https://([^/]+)/", 1).alias("h"))
        .distinct()
        .collect()
    )


def test_throttle_requires_politeness(spark, tmp_path):
    path = str(tmp_path / "c")
    write_corpus(spark, path, 4, HOSTS, SEED)
    with pytest.raises(ValueError, match="politeness"):
        CrawlLoop(
            spark, str(tmp_path / "e"), path, corpus_seed=SEED,
            throttle={"every": 2},
        )


def test_throttle_loop_adjusts_domain_delays(spark, tmp_path):
    corpus_path = str(tmp_path / "corpus")
    write_corpus(spark, corpus_path, N, HOSTS, SEED)
    hosts = _hosts_in(spark, corpus_path)
    flaky = hosts[-1]
    policies = [(h, True, 0.5, None) for h in hosts]
    loop = CrawlLoop(
        spark, str(tmp_path / "eng"), corpus_path, corpus_seed=SEED,
        strategy="bfs", batch_size=16, n_partitions=1, mode="global",
        check_invariant=False,
        politeness=spark.createDataFrame(policies, POLICY_SCHEMA),
        flaky_hosts={flaky: 99},  # fails every attempt: 100% error rate
        throttle={"every": 2, "relief_s": 0.25},
    )
    loop.add_seeds([url_of(0, HOSTS)])
    loop.run(max_iterations=30)
    delays = {
        r["host"]: r["delay_s"]
        for r in loop.scheduler.domains.read().select("host", "delay_s").collect()
    }
    # the always-failing host was backed off (multiplied at least once)...
    assert delays[flaky] >= 1.0, delays
    # ...and every healthy host that was actually crawled relaxed below its
    # starting delay
    healthy = [h for h in hosts if h != flaky]
    assert all(delays[h] < 0.5 for h in healthy), delays
