#!/usr/bin/env python
"""Same-session A/B bench: r1 code vs current HEAD on the frontier + crawl
stages (VERDICT r2 #1 — pin or clear the r1→r2 schedule/dedup/crawl drop).

Method: the two code versions run INTERLEAVED in one host session (r1, head,
r1, head, ...), each leg in a FRESH JVM with identical config, a fresh engine
workdir, and NO query preamble (the per-round driver bench runs ~41 queries
in the same JVM before the frontier section — a suspected contaminant).
Interleaving cancels slow host drift; fresh JVMs cancel warmup/cache
carry-over. Reports per-leg numbers plus the per-stage best across reps,
which is how BENCH.md headline numbers are defined.

Usage:  python ab_bench.py [--reps 2] [--ref <commit>] [--urls 2000000]
Writes: AB_BENCH.json (all legs + summary), prints the summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

LEG_CODE = r"""
import json, os, sys, tempfile
sys.path.insert(0, os.getcwd())
import bench
from frontera_spark.session import get_spark

spark = get_spark("ab_bench_leg", master="local[%(cpus)d]")
spark.range(10).count()  # JVM warm-up outside timed sections

def _norm(r):
    # r5 bench_* return (medians, per-rep arrays); older tags return a
    # plain dict — normalize so the aggregator sees one shape either way
    if isinstance(r, tuple) and len(r) == 2 and isinstance(r[0], dict):
        med = dict(r[0]); med["_reps"] = r[1]
        return med
    return r

out = {}
with tempfile.TemporaryDirectory() as wd:
    out["frontier"] = _norm(bench.bench_frontier(spark, wd))
with tempfile.TemporaryDirectory() as wd:
    out["crawl"] = _norm(bench.bench_crawl(spark, wd))
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def run_leg(code_dir: str, cpus: int, urls: int, images: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_URLS"] = str(urls)
    env["SPARK_GRAFT_BENCH_IMAGES"] = str(images)
    env["PYTHONPATH"] = code_dir
    proc = subprocess.run(
        [sys.executable, "-c", LEG_CODE % {"cpus": cpus}],
        cwd=code_dir,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"leg in {code_dir} produced no ABRESULT\n--- stdout:\n"
        f"{proc.stdout[-3000:]}\n--- stderr:\n{proc.stderr[-3000:]}"
    )


STAGES = [
    ("schedule_urls_per_sec", "frontier", True),
    ("dedup_urls_per_sec", "frontier", True),
    ("pop_sec", "frontier", False),
    ("pages_per_sec", "crawl", True),
]


def best(legs: list[dict]) -> dict:
    out = {}
    for key, sect, higher in STAGES:
        vals = [leg[sect][key] for leg in legs]
        out[key] = max(vals) if higher else min(vals)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ref", default="4b767d8", help="baseline commit (r1 end)")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--urls", type=int, default=2_000_000)
    ap.add_argument("--images", type=int, default=2000)
    ap.add_argument("--out", default="AB_BENCH.json", help="report file name")
    args = ap.parse_args()

    head_dir = os.path.dirname(os.path.abspath(__file__))
    ref_dir = tempfile.mkdtemp(prefix="ab_ref_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", ref_dir, args.ref],
        cwd=head_dir,
        check=True,
        capture_output=True,
    )
    try:
        legs: dict[str, list[dict]] = {"ref": [], "head": []}
        for rep in range(args.reps):
            for name, d in (("ref", ref_dir), ("head", head_dir)):
                print(f"[ab] rep {rep + 1}/{args.reps} leg={name}", flush=True)
                legs[name].append(run_leg(d, args.cpus, args.urls, args.images))
        summary = {
            "ref_commit": args.ref,
            "cpus": args.cpus,
            "urls": args.urls,
            "images": args.images,
            "reps": args.reps,
            "ref_best": best(legs["ref"]),
            "head_best": best(legs["head"]),
        }
        summary["ratio_head_over_ref"] = {
            k: round(summary["head_best"][k] / summary["ref_best"][k], 3)
            for k, _, _ in STAGES
        }
        report = {"legs": legs, "summary": summary}
        with open(os.path.join(head_dir, args.out), "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(summary, indent=2))
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", ref_dir],
            cwd=head_dir,
            capture_output=True,
        )


if __name__ == "__main__":
    main()
