#!/usr/bin/env python
"""Benchmark harness (driver contract + SURVEY.md §7.3 M8).

Runs the headline queries from the driver contract at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` plus the
engine-native frontier benchmarks (URLs scheduled/sec through canonicalize →
fingerprint → exact-dedup MERGE — the BASELINE.json headline metric), and
prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "frontier": {...}}

Scaling-efficiency evidence (same job at two parallelism levels) lives in
``scaling_bench.py`` — it is slower and runs two JVMs, so it is kept out of
the per-round driver bench.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# sf-dir name → numeric sf for the report
_SF = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")


def _sf() -> float:
    try:
        return float(_SF)
    except ValueError:
        return -1.0


def bench_queries(spark) -> dict[str, float]:
    from frontera_spark.operators.driver_queries import QUERIES

    times: dict[str, float] = {}
    for name, (fn, _sql) in QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()  # force full execution
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def bench_frontier(spark, workdir: str) -> dict[str, float]:
    """Engine-native throughput: the BASELINE headline numbers.

    - schedule: N synthetic URLs → canonicalize (pandas UDF) → fingerprint →
      exact-dedup anti-join → MERGE INTO frontier (urls/sec).
    - dedup re-offer: offer the SAME N URLs again — all must dedup out
      (frontier-dedup throughput).
    - pop: strategy-ordered per-partition top-k batch generation.
    """
    from pyspark.sql import functions as F

    from frontera_spark.core.frontier import FrontierEngine

    # 2M default: small enough for the per-round bench window, large enough
    # that per-batch fixed cost (~15 s/cycle) doesn't dominate the rate
    n = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "2000000"))
    n_hosts = 101
    engine = FrontierEngine(
        spark, os.path.join(workdir, "bench_frontier"), n_partitions=CPUS, strategy="bfs"
    )
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
    urls.count()  # materialize input outside the timed section

    out: dict[str, float] = {}
    t0 = time.perf_counter()
    n_new = engine.add_seeds(urls)
    dt = time.perf_counter() - t0
    out["schedule_urls_per_sec"] = round(n / dt, 1)
    out["schedule_sec"] = round(dt, 3)
    assert n_new == n, f"expected {n} fresh, got {n_new}"

    t0 = time.perf_counter()
    n_dup = engine.add_seeds(urls)
    dt = time.perf_counter() - t0
    out["dedup_urls_per_sec"] = round(n / dt, 1)
    out["dedup_sec"] = round(dt, 3)
    assert n_dup == 0, f"expected 0 fresh on re-offer, got {n_dup}"

    t0 = time.perf_counter()
    batch = engine.get_next_requests(2048, mode="per_partition")
    popped = batch.count()
    dt = time.perf_counter() - t0
    batch.unpersist()
    out["pop_sec"] = round(dt, 3)
    out["pop_rows"] = popped
    urls.unpersist()
    return out


def bench_crawl(spark, workdir: str) -> dict[str, float]:
    """End-to-end crawl-loop throughput over the image+caption corpus:
    pages/sec through feed-pop → fetch join → PNG decode + PSNR/caption
    invariant → link extraction → MERGE (the BASELINE headline job)."""
    from frontera_spark.sources.corpus import url_of, write_corpus
    from frontera_spark.streaming.loop import CrawlLoop

    n_images = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "2000"))
    corpus_path = os.path.join(workdir, "corpus")
    write_corpus(spark, corpus_path, n_images, 31, 42)
    loop = CrawlLoop(
        spark,
        os.path.join(workdir, "crawl"),
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
    return {
        "pages": fetched,
        "iterations": len(hist),
        "crawl_sec": round(dt, 3),
        "pages_per_sec": round(fetched / dt, 1),
        "invariant_violations": sum(m.get("invariant_violations", 0) for m in hist),
    }


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(CPUS))
    from frontera_spark.session import get_spark

    spark = get_spark("frontera_spark_bench", master=f"local[{CPUS}]")
    spark.range(10).count()  # JVM warm-up outside any timed section

    t_all = time.perf_counter()
    queries = bench_queries(spark)
    with tempfile.TemporaryDirectory() as workdir:
        frontier = bench_frontier(spark, workdir)
    with tempfile.TemporaryDirectory() as workdir:
        crawl = bench_crawl(spark, workdir)
    total = round(time.perf_counter() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "headline queries + frontier schedule/dedup + crawl-loop throughput",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": _sf(),
                "frontier": frontier,
                "crawl": crawl,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
