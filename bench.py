#!/usr/bin/env python
"""Benchmark harness (driver contract + SURVEY.md §7.3 M8).

Runs the headline queries from the driver contract at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` plus the
engine-native frontier benchmarks (URLs scheduled/sec through canonicalize →
fingerprint → exact-dedup MERGE — the BASELINE.json headline metric), and
prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "frontier": {...}}

Drift-robust protocol (VERDICT r4 wrong #2: single-rep headline files were
uninterpretable under this host's ±2× session-to-session drift): every stage
runs ``$SPARK_GRAFT_BENCH_REPS`` times (default 3) in one process; the
headline numbers are per-stage MEDIANS and the raw per-rep arrays ride along
("queries_reps", "frontier_reps", "crawl_reps") so a reader can judge spread
without re-running. Once-per-corpus index BUILDS (persisted LSH, trained
IVF) are timed separately under "index_builds" (VERDICT r4 wrong #1: folding
them into incremental_neardup / ivf_topk hid probe regressions) — the query
entries are pure probe legs.

Scaling-efficiency evidence (same job at two parallelism levels) lives in
``scaling_bench.py`` — it is slower and runs two JVMs, so it is kept out of
the per-round driver bench.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
# sf-dir name → numeric sf for the report
_SF = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")


def _sf() -> float:
    try:
        return float(_SF)
    except ValueError:
        return -1.0


def _median(xs: list[float]) -> float:
    return round(statistics.median(xs), 3)


def bench_index_builds(spark) -> dict[str, float]:
    """Once-per-corpus-version index builds, priced separately from the
    probe queries they serve. Memoized per (session, sf_dir): the first call
    here is the build; every later query rep pays only the probe."""
    from frontera_spark.operators.driver_queries import (
        ivf_index_build,
        lsh_index_build,
    )

    out: dict[str, float] = {}
    for name, fn in (("lsh_index_build", lsh_index_build), ("ivf_index_build", ivf_index_build)):
        t0 = time.perf_counter()
        fn(spark, SF_DIR)
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def bench_queries(spark) -> tuple[dict[str, float], dict[str, list[float]]]:
    from frontera_spark.operators.driver_queries import QUERIES

    reps: dict[str, list[float]] = {name: [] for name in QUERIES}
    for _ in range(REPS):
        for name, (fn, _sql) in QUERIES.items():
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()  # force full execution
            reps[name].append(round(time.perf_counter() - t0, 3))
    return {n: _median(ts) for n, ts in reps.items()}, reps


def bench_frontier(spark, workdir: str) -> dict[str, float]:
    """Engine-native throughput: the BASELINE headline numbers.

    - schedule: N synthetic URLs → canonicalize (pandas UDF) → fingerprint →
      exact-dedup anti-join → MERGE INTO frontier (urls/sec).
    - dedup re-offer: offer the SAME N URLs again — all must dedup out
      (frontier-dedup throughput).
    - pop: strategy-ordered per-partition top-k batch generation.

    Each rep uses a fresh frontier dir (the schedule leg must see an empty
    seen set); the input frame is materialized once outside every timed
    section.
    """
    from pyspark.sql import functions as F

    from frontera_spark.core.frontier import FrontierEngine

    # 2M default: small enough for the per-round bench window, large enough
    # that per-batch fixed cost (~15 s/cycle) doesn't dominate the rate
    n = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "2000000"))
    n_hosts = 101
    urls = spark.range(n).select(
        F.concat(
            F.lit("https://h"),
            F.lpad((F.crc32(F.col("id").cast("string")) % n_hosts).cast("string"), 3, "0"),
            F.lit(".example.test/i/img"),
            F.lpad(F.col("id").cast("string"), 8, "0"),
        ).alias("url"),
        F.col("id").alias("seq"),
    )
    urls = urls.cache()
    urls.count()  # materialize input outside the timed sections

    out: dict[str, float] = {"schedule_sec": [], "dedup_sec": [], "pop_sec": []}
    for rep in range(REPS):
        engine = FrontierEngine(
            spark,
            os.path.join(workdir, f"bench_frontier_{rep}"),
            n_partitions=CPUS,
            strategy="bfs",
        )
        t0 = time.perf_counter()
        n_new = engine.add_seeds(urls)
        out["schedule_sec"].append(round(time.perf_counter() - t0, 3))
        assert n_new == n, f"expected {n} fresh, got {n_new}"

        t0 = time.perf_counter()
        n_dup = engine.add_seeds(urls)
        out["dedup_sec"].append(round(time.perf_counter() - t0, 3))
        assert n_dup == 0, f"expected 0 fresh on re-offer, got {n_dup}"

        t0 = time.perf_counter()
        batch = engine.get_next_requests(2048, mode="per_partition")
        popped = batch.count()
        out["pop_sec"].append(round(time.perf_counter() - t0, 3))
        batch.unpersist()
    urls.unpersist()
    sched, dedup, pop = (
        _median(out["schedule_sec"]),
        _median(out["dedup_sec"]),
        _median(out["pop_sec"]),
    )
    return {
        "schedule_urls_per_sec": round(n / sched, 1),
        "schedule_sec": sched,
        "dedup_urls_per_sec": round(n / dedup, 1),
        "dedup_sec": dedup,
        "pop_sec": pop,
        "pop_rows": popped,
    }, out


def bench_crawl(spark, workdir: str) -> dict[str, float]:
    """End-to-end crawl-loop throughput over the image+caption corpus:
    pages/sec through feed-pop → fetch join → PNG decode + PSNR/caption
    invariant → link extraction → MERGE (the BASELINE headline job)."""
    from frontera_spark.sources.corpus import url_of, write_corpus
    from frontera_spark.streaming.loop import CrawlLoop

    n_images = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "2000"))
    corpus_path = os.path.join(workdir, "corpus")
    write_corpus(spark, corpus_path, n_images, 31, 42)
    reps = {"crawl_sec": [], "pages_per_sec": []}
    for rep in range(REPS):
        loop = CrawlLoop(
            spark,
            os.path.join(workdir, f"crawl_{rep}"),
            corpus_path,
            strategy="bfs",
            batch_size=2048,
            n_partitions=CPUS,
            mode="per_partition",
        )
        loop.add_seeds([url_of(0, 31)])
        t0 = time.perf_counter()
        hist = loop.run(max_iterations=64)
        dt = time.perf_counter() - t0
        fetched = sum(m["n_fetched"] for m in hist)
        viol = sum(m.get("invariant_violations", 0) for m in hist)
        assert viol == 0, f"invariant violations: {viol}"
        reps["crawl_sec"].append(round(dt, 3))
        reps["pages_per_sec"].append(round(fetched / dt, 1))
    return {
        "pages": fetched,
        "iterations": len(hist),
        "crawl_sec": _median(reps["crawl_sec"]),
        "pages_per_sec": round(statistics.median(reps["pages_per_sec"]), 1),
        "invariant_violations": 0,
    }, reps


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(CPUS))
    from frontera_spark.session import get_spark

    spark = get_spark("frontera_spark_bench", master=f"local[{CPUS}]")
    spark.range(10).count()  # JVM warm-up outside any timed section

    t_all = time.perf_counter()
    builds = bench_index_builds(spark)
    queries, queries_reps = bench_queries(spark)
    with tempfile.TemporaryDirectory() as workdir:
        frontier, frontier_reps = bench_frontier(spark, workdir)
    with tempfile.TemporaryDirectory() as workdir:
        crawl, crawl_reps = bench_crawl(spark, workdir)
    total = round(time.perf_counter() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": (
                    "headline queries + frontier schedule/dedup + crawl-loop "
                    f"throughput (medians of {REPS} reps; index builds priced "
                    "separately)"
                ),
                "value": total,
                "unit": "sec",
                "reps": REPS,
                "queries": queries,
                "queries_reps": queries_reps,
                "index_builds": builds,
                "sf": _sf(),
                "frontier": frontier,
                "frontier_reps": frontier_reps,
                "crawl": crawl,
                "crawl_reps": crawl_reps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
