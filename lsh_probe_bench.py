"""Probe-cost flatness evidence for the persisted MinHash-LSH index.

The round-3 verdict's top item: per-ingest near-dup lookup must not rescan
corpus text, so batch-probe cost should stay ~flat as the corpus grows
(sf0.01 → sf0.1 is 10× the documents). This script builds the index at each
scale, probes the SAME deterministic 150-doc batch, and prints one JSON line:

    {"metric": "lsh_probe_sec", "build": {...}, "probe": {...},
     "probe_ratio_sf01_over_sf001": R}

Build time is the once-per-corpus-version cost (expected ~linear); probe time
is the per-ingest cost (expected ~flat — it reads the narrow band/set index
partitions matching the batch's signature buckets, never text). Run alone on
the box; concurrent Spark sessions contaminate timings.
"""

import json
import os
import tempfile
import time

from pyspark.sql import functions as F

from frontera_spark.operators.lsh_index import MinHashLshIndex
from frontera_spark.session import get_spark

SFS = ["sf0.01", "sf0.1"]
ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def batch_of(docs, n=150):
    """Deterministic near-dup batch: first n docs, first token dropped."""
    toks = F.split(F.col("text"), r"\s+")
    return docs.filter(F.col("doc_id") < n).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 2, F.size(toks) - 1)).alias("text"),
    )


def main():
    spark = get_spark("lsh_probe_bench", master=f"local[{CPUS}]")
    build_s, probe_s, hits = {}, {}, {}
    for sf in SFS:
        docs = spark.read.parquet(os.path.join(ROOT, sf, "documents.parquet")).select(
            "doc_id", "text"
        )
        path = tempfile.mkdtemp(prefix=f"lshidx_{sf}_")
        t0 = time.monotonic()
        idx = MinHashLshIndex.build(spark, path, docs)
        build_s[sf] = round(time.monotonic() - t0, 3)
        b = batch_of(docs)
        # warm-up probe (JVM/python-worker warmup), then the measured one
        idx.probe(b, jaccard_min=0.6).count()
        t0 = time.monotonic()
        hits[sf] = idx.probe(b, jaccard_min=0.6).count()
        probe_s[sf] = round(time.monotonic() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "lsh_probe_sec",
                "build": build_s,
                "probe": probe_s,
                "probe_hits": hits,
                "probe_ratio_sf01_over_sf001": round(
                    probe_s["sf0.1"] / probe_s["sf0.01"], 3
                ),
                "cpus": int(CPUS),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
