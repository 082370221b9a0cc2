#!/usr/bin/env python
"""Revisit-tick cost vs crawl history: full-log recompute vs incremental fold.

The claim under test (core/revisit.py ``fold_fetch_slice`` + the loop's
incremental tick): the tick's cost should track the NEW fetch slice, not the
total fetch history. Decisions are identical either way (pinned by
tests/test_revisit_fold.py and the ``revisit_fold`` driver oracle); this
measures cost only, two legs per history size H on the same synthetic log:

  full        time of ``fetchlog_schedule(all H rows)`` — a per-page sort
              window over the entire history, paid again every tick;
  incremental time of ``fold_fetch_slice(key-pruned state, slice)`` →
              ``state_schedule`` — one window over the SLICE only plus a
              slice-sized join against the per-page state (built once,
              untimed: that is the amortized prior-ticks work the fold
              replaces). Slice size is FIXED while H grows.

Expected shape: full grows ~linearly in H; incremental stays flat.

Secondary (``--loop``): the same comparison inside a real CrawlLoop at toy
scale (1.5k pages, 24 iterations). There the HISTORY is tiny, so the full
recompute is cheap while the incremental leg pays a fixed per-tick
state-table MERGE — measured 2.1 s vs 3.0 s per tick (2026-08-19): the fold
wins only once history >> slice, which is exactly the long-crawl regime it
exists for. Both numbers are reported; neither mode changes decisions.

Usage: python revisit_bench.py [--pages 200000] [--slice 100000]
                               [--iters 2 8 32] [--loop]
Prints one JSON line per leg set.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time


def _mean(xs):
    return round(sum(xs) / len(xs), 3) if xs else None


def synth_log(spark, pages: int, iters: int, change_every: int):
    """Deterministic fetch log: `pages` pages × iterations 0..iters-1.
    A page's signature flips every `change_every` iterations for even
    pages (dynamic) and never for odd pages (static)."""
    from pyspark.sql import functions as F

    n = pages * iters
    return (
        spark.range(n)
        .select(
            (F.col("id") % pages).alias("fingerprint"),
            ((F.col("id") % pages) % 32).cast("int").alias("partition_id"),
            (F.col("id") / pages).cast("long").alias("iteration"),
        )
        .withColumn(
            "sig",
            F.when(
                F.col("fingerprint") % 2 == 0,
                (F.col("iteration") / change_every).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
    )


def run_fold_bench(spark, args) -> dict:
    from pyspark.sql import functions as F

    from frontera_spark.core.revisit import (
        fetchlog_schedule,
        fold_fetch_slice,
        state_schedule,
    )

    out = {}
    with tempfile.TemporaryDirectory() as td:
        for iters in args.iters:
            hist = synth_log(spark, args.pages, iters, change_every=3)
            hpath = f"{td}/log_{iters}"
            hist.write.parquet(hpath)
            log = spark.read.parquet(hpath)
            # fixed-size slice: the NEXT iteration for the first `slice` pages
            sl = (
                synth_log(spark, args.pages, iters + 1, change_every=3)
                .filter(
                    (F.col("iteration") == iters)
                    & (F.col("fingerprint") < args.slice)
                )
            )
            spath = f"{td}/slice_{iters}"
            sl.write.parquet(spath)
            sl = spark.read.parquet(spath)

            # amortized prior work, untimed: the state the previous ticks built
            state = fold_fetch_slice(None, log)
            st_path = f"{td}/state_{iters}"
            state.write.parquet(st_path)
            state = spark.read.parquet(st_path)

            full_t, incr_t = [], []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fetchlog_schedule(
                    log.unionByName(sl), base_interval_s=30
                ).write.mode("overwrite").parquet(f"{td}/out_full")
                full_t.append(round(time.perf_counter() - t0, 3))

                t0 = time.perf_counter()
                pruned = state.join(
                    F.broadcast(sl.select("fingerprint").distinct()),
                    "fingerprint",
                    "left_semi",
                )
                folded = fold_fetch_slice(pruned, sl)
                state_schedule(folded, base_interval_s=30).write.mode(
                    "overwrite"
                ).parquet(f"{td}/out_incr")
                incr_t.append(round(time.perf_counter() - t0, 3))
            out[f"history={args.pages * iters}"] = {
                "iters": iters,
                "full_sec": _mean(full_t),
                "incremental_sec": _mean(incr_t),
                "full_reps": full_t,
                "incremental_reps": incr_t,
            }
    return out


def run_conditional_leg(spark, conditional: bool, corpus: str, seed: int, args) -> dict:
    """One crawl-loop leg for the conditional re-fetch (HTTP 304) comparison:
    incremental revisit over a mostly-static corpus (one dynamic host), with
    the conditional split off/on. Decisions and fetch logs are identical
    (pinned by tests/test_conditional_revisit.py); this measures the IO the
    304 path removes — bytes through the payload join — plus wall time."""
    from frontera_spark.sources.corpus import url_of
    from frontera_spark.streaming.loop import CrawlLoop

    with tempfile.TemporaryDirectory() as wd:
        loop = CrawlLoop(
            spark,
            wd,
            corpus,
            corpus_seed=seed,
            strategy="bfs",
            batch_size=args.batch,
            n_partitions=8,
            mode="global",
            revisit={
                "every": 2,
                "bootstrap_after": 2,
                "mode": "incremental",
                "conditional": conditional,
            },
            dynamic_hosts={"h001.example.test": 2},
        )
        loop.add_seeds([url_of(0, args.hosts)])
        t0 = time.perf_counter()
        hist = loop.run(max_iterations=args.loop_iters)
        dt = time.perf_counter() - t0
        bad = sum(m.get("invariant_violations", 0) for m in hist)
        if bad:
            raise SystemExit(f"invariant violations (conditional={conditional}): {bad}")
        fetched = sum(m.get("n_fetched", 0) for m in hist)
        return {
            "conditional": conditional,
            "bytes_fetched": sum(m.get("bytes_fetched", 0) for m in hist),
            "n_fetched": fetched,
            "n_not_modified": sum(m.get("n_not_modified", 0) for m in hist),
            "wall_sec": round(dt, 3),
            "pages_per_sec": round(fetched / dt, 1),
        }


def run_loop_mode(spark, mode: str, corpus: str, seed: int, args) -> list[float]:
    from frontera_spark.sources.corpus import url_of
    from frontera_spark.streaming.loop import CrawlLoop

    with tempfile.TemporaryDirectory() as wd:
        loop = CrawlLoop(
            spark,
            wd,
            corpus,
            corpus_seed=seed,
            strategy="bfs",
            batch_size=args.batch,
            n_partitions=8,
            mode="global",
            revisit={"every": 1, "bootstrap_after": 2, "mode": mode},
            dynamic_hosts={
                "h000.example.test": 1,
                "h001.example.test": 2,
            },
        )
        ticks: list[float] = []
        orig = loop._revisit_tick

        def timed() -> int:
            t0 = time.perf_counter()
            n = orig()
            ticks.append(round(time.perf_counter() - t0, 3))
            return n

        loop._revisit_tick = timed
        loop.add_seeds([url_of(0, args.hosts)])
        hist = loop.run(max_iterations=args.loop_iters)
        bad = sum(m.get("invariant_violations", 0) for m in hist)
        if bad:
            raise SystemExit(f"invariant violations in {mode} leg: {bad}")
        return ticks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--slice", type=int, default=100_000)
    ap.add_argument("--iters", type=int, nargs="+", default=[2, 8, 32])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--loop", action="store_true", help="crawl-loop secondary bench")
    ap.add_argument(
        "--conditional",
        action="store_true",
        help="conditional re-fetch (HTTP 304) byte-savings comparison",
    )
    ap.add_argument("--images", type=int, default=1500)
    ap.add_argument("--hosts", type=int, default=24)
    ap.add_argument("--loop-iters", type=int, default=24)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from frontera_spark.session import get_spark

    spark = get_spark("revisit_bench")
    spark.range(10).count()  # JVM warm-up outside timed sections

    out = {"pages": args.pages, "slice": args.slice, "reps": args.reps}
    if not args.conditional:
        out["fold"] = run_fold_bench(spark, args)

    if args.conditional:
        from frontera_spark.sources.corpus import write_corpus

        out["conditional"] = {"images": args.images, "iters": args.loop_iters}
        with tempfile.TemporaryDirectory() as cd:
            corpus = f"{cd}/corpus"
            write_corpus(spark, corpus, args.images, args.hosts, args.seed)
            for cond in (False, True):
                leg = run_conditional_leg(spark, cond, corpus, args.seed, args)
                out["conditional"]["cond" if cond else "full"] = leg
        full, cond = out["conditional"]["full"], out["conditional"]["cond"]
        out["conditional"]["bytes_saved_pct"] = round(
            100 * (1 - cond["bytes_fetched"] / max(full["bytes_fetched"], 1)), 1
        )

    if args.loop:
        from frontera_spark.sources.corpus import write_corpus

        out["loop"] = {"images": args.images, "iters": args.loop_iters}
        with tempfile.TemporaryDirectory() as cd:
            corpus = f"{cd}/corpus"
            write_corpus(spark, corpus, args.images, args.hosts, args.seed)
            for mode in ("full", "incremental"):
                ticks = run_loop_mode(spark, mode, corpus, args.seed, args)
                out["loop"][mode] = {
                    "ticks_sec": ticks,
                    "first5_mean": _mean(ticks[:5]),
                    "last5_mean": _mean(ticks[-5:]),
                }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
