#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE north rule, sandbox proxy).

The rule's criterion — throughput scaling efficiency ≥ 0.8 from N to 4N
executors — cannot use a real cluster here, so this runs the SAME frontier
job (canonicalize → fingerprint → exact-dedup MERGE of fresh URLs, then a
full-duplicate re-offer, then a per-partition strategy pop) at two
parallelism levels, local[8] and local[32], each in a fresh JVM, on the same
deterministically-generated input, and reports throughput at both plus

    efficiency = R_4N / (4 × R_N)

Usage: python scaling_bench.py            (outer: runs both, prints JSON)
       python scaling_bench.py --inner 8  (one measurement, used internally)

Results land in BENCH.md (§scaling) — refreshed in place.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

N_URLS = int(os.environ.get("SPARK_GRAFT_SCALE_URLS", "4000000"))
CORES = (8, 32)


def inner(cores: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from frontera_spark.core.frontier import FrontierEngine
    from frontera_spark.session import get_spark

    spark = get_spark(f"scaling_bench_{cores}", master=f"local[{cores}]")
    spark.range(10).count()  # JVM warm-up
    n_hosts = 101
    urls = (
        spark.range(N_URLS)
        .select(
            F.concat(
                F.lit("https://h"),
                F.lpad((F.crc32(F.col("id").cast("string")) % n_hosts).cast("string"), 3, "0"),
                F.lit(".example.test/i/img"),
                F.lpad(F.col("id").cast("string"), 8, "0"),
            ).alias("url"),
            F.col("id").alias("seq"),
        )
        .cache()
    )
    urls.count()

    with tempfile.TemporaryDirectory() as d:
        eng = FrontierEngine(spark, d, n_partitions=cores, strategy="bfs")
        t0 = time.perf_counter()
        n_new = eng.add_seeds(urls)
        sched_s = time.perf_counter() - t0
        assert n_new == N_URLS

        t0 = time.perf_counter()
        n_dup = eng.add_seeds(urls)
        dedup_s = time.perf_counter() - t0
        assert n_dup == 0

        t0 = time.perf_counter()
        batch = eng.get_next_requests(4096, mode="per_partition")
        popped = batch.count()
        pop_s = time.perf_counter() - t0
        batch.unpersist()

    print(
        "INNER_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "n_urls": N_URLS,
                "schedule_s": round(sched_s, 2),
                "dedup_s": round(dedup_s, 2),
                "pop_s": round(pop_s, 2),
                "pop_rows": popped,
                "schedule_urls_per_sec": round(N_URLS / sched_s, 0),
                "dedup_urls_per_sec": round(N_URLS / dedup_s, 0),
            }
        )
    )
    spark.stop()


def outer() -> None:
    results = {}
    for cores in CORES:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner", str(cores)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("INNER_RESULT ")), None
        )
        if line is None:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            raise RuntimeError(f"inner run at {cores} cores produced no result")
        results[cores] = json.loads(line[len("INNER_RESULT ") :])

    lo, hi = CORES
    factor = hi / lo
    eff = {
        metric: round(
            results[hi][f"{metric}_urls_per_sec"]
            / (factor * results[lo][f"{metric}_urls_per_sec"]),
            3,
        )
        for metric in ("schedule", "dedup")
    }
    out = {
        "metric": f"frontier throughput scaling local[{lo}] -> local[{hi}] (N -> 4N proxy)",
        "n_urls": N_URLS,
        "runs": results,
        "efficiency": eff,
    }
    print(json.dumps(out))
    _update_bench_md(out)


def _update_bench_md(out: dict) -> None:
    lo, hi = CORES
    r8, r32 = out["runs"][lo], out["runs"][hi]
    section = f"""<!-- SCALING_AUTOGEN_BEGIN -->
## Scaling efficiency (N → 4N proxy: local[{lo}] vs local[{hi}])

Same job, same {out['n_urls']:,}-URL input, fresh JVM per level
(`python scaling_bench.py`). Criterion (BASELINE north rule): efficiency =
R_4N / (4 × R_N) ≥ 0.8.

| stage | local[{lo}] urls/s | local[{hi}] urls/s | efficiency |
|---|---|---|---|
| schedule (canonicalize→fingerprint→dedup→MERGE) | {r8['schedule_urls_per_sec']:,.0f} | {r32['schedule_urls_per_sec']:,.0f} | **{out['efficiency']['schedule']}** |
| dedup re-offer (100% duplicates) | {r8['dedup_urls_per_sec']:,.0f} | {r32['dedup_urls_per_sec']:,.0f} | **{out['efficiency']['dedup']}** |

Pop (per-partition strategy top-k): {r8['pop_s']}s @ {lo} cores, {r32['pop_s']}s @ {hi} cores.
<!-- SCALING_AUTOGEN_END -->"""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md")
    body = ""
    if os.path.exists(path):
        body = open(path).read()
        if "<!-- SCALING_AUTOGEN_BEGIN -->" in body:
            pre = body.split("<!-- SCALING_AUTOGEN_BEGIN -->")[0]
            post = body.split("<!-- SCALING_AUTOGEN_END -->")[-1]
            body = pre + section + post
        else:
            body = body.rstrip() + "\n\n" + section + "\n"
    else:
        body = "# BENCH — frontera_spark\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(body)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--inner":
        inner(int(sys.argv[2]))
    else:
        outer()
