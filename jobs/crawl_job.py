"""spark-submit entry point for the crawl loop (north-rule packaging path).

Cluster usage (the package ships as a zip via --py-files; no repo checkout
needed on executors):

    python -m zipfile -c frontera_spark.zip frontera_spark
    spark-submit --master <cluster> --py-files frontera_spark.zip \\
        jobs/crawl_job.py --n-images 100000 --batch 8192 \\
        --mode per_partition --partitions 256 --workdir hdfs://.../crawl1

Local smoke: spark-submit --master local[8] --py-files frontera_spark.zip \\
    jobs/crawl_job.py --n-images 200 --workdir /tmp/crawl-smoke

The SparkSession comes from spark-submit's conf; only engine-relevant
SQL conf is applied here (a spark-submit job must not override the
cluster's master/memory settings).
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser(description="Corpus-backed crawl, cluster-submittable.")
    ap.add_argument("--n-images", type=int, default=1000)
    ap.add_argument("--n-hosts", type=int, default=31)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--strategy", default="bfs")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--max-per-host", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--mode", default="per_partition", choices=["global", "per_partition"])
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--max-iterations", type=int, default=10_000)
    ap.add_argument(
        "--content-dedup",
        action="store_true",
        help="mirror handling: drop links from pages whose body signature "
        "was already crawled at another URL",
    )
    ap.add_argument(
        "--dust-every",
        type=int,
        default=None,
        help="mine DUST parameter-irrelevance rules every N iterations and "
        "strip mined params from candidate links before scheduling",
    )
    ap.add_argument("--dust-min-support", type=int, default=2)
    ap.add_argument(
        "--alias-share",
        type=float,
        default=0.0,
        help="fraction of corpus child links emitted as ?sess= aliases "
        "(the DUST fixture; implies the server ignores 'sess')",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("frontera_spark_crawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from frontera_spark.sources.corpus import url_of, write_corpus
    from frontera_spark.streaming.loop import CrawlLoop

    corpus_path = os.path.join(args.workdir, "corpus")
    if not os.path.exists(corpus_path):
        write_corpus(
            spark, corpus_path, args.n_images, args.n_hosts, args.seed,
            alias_share=args.alias_share,
        )
    loop = CrawlLoop(
        spark,
        os.path.join(args.workdir, "engine"),
        corpus_path,
        corpus_seed=args.seed,
        strategy=args.strategy,
        batch_size=args.batch,
        max_per_host=args.max_per_host,
        n_partitions=args.partitions,
        mode=args.mode,
        content_dedup=args.content_dedup,
        dust=(
            {"every": args.dust_every, "min_support": args.dust_min_support}
            if args.dust_every
            else None
        ),
        server_ignores=("sess",) if args.alias_share > 0 else (),
    )
    if loop.engine.count() == 0:
        loop.add_seeds([url_of(0, args.n_hosts)])
    hist = loop.run(max_iterations=args.max_iterations, verbose=True)
    total = sum(m["n_fetched"] for m in hist)
    viol = sum(m.get("invariant_violations", 0) for m in hist)
    print(f"CRAWL_DONE pages={total} iterations={len(hist)} invariant_violations={viol}")
    spark.stop()


if __name__ == "__main__":
    main()
