"""spark-submit entry point: archive a crawl's fetched pages as WARC.

The archival tier every production frontier feeds (Heritrix writes WARC
natively; frontera deployments bolted warc writers onto scrapy): read the
frontier table of a finished (or in-flight) crawl, select the CRAWLED
rows, join the corpus payloads back by canonical URL (the crawl loop
itself never persists ``bytes`` — parquet column pruning keeps the 100 TB
IO term out of frontier state, SURVEY.md §7.4.4), frame each page as a
WARC 1.0 record (sources/warc.py) and write one ``part-*.warc.gz`` per
partition, records hash-partitioned by host so each archive file holds
contiguous per-host runs.

Plan shape at scale: frontier scan is column-pruned to (canonical_url,
state); the corpus join is the only stage that touches payload bytes and
shuffles nothing when the crawled slice broadcasts (the common case — a
crawl segment is small against a 100 TB corpus); the WARC write is a
shuffle-free mapInPandas stream per partition.

    spark-submit --master <cluster> --py-files frontera_spark.zip \\
        jobs/warc_archive.py --workdir hdfs://.../crawl --corpus \\
        hdfs://.../corpus.parquet --output hdfs://.../archive

Local smoke (runs a small crawl first when --workdir is omitted):

    python jobs/warc_archive.py --output $(mktemp -d)/archive
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def archive_crawled(spark, frontier_df, corpus_df, output: str, date: str | None = None,
                    n_parts: int = 0, dedup: bool = False):
    """Archive every CRAWLED frontier row whose payload the corpus holds;
    returns the per-part manifest (pandas). Column-pruned scans, broadcast
    crawled-slice join, shuffle only for the explicit host repartition.

    ``dedup=True`` applies WARC's identical-payload-digest convention
    (spec §6.7.2 — the Heritrix mirror-handling idea the crawl loop's
    content_dedup applies to LINKS): per sha1 digest, the first URL
    (min) stores the full response; every other capture becomes a
    zero-payload ``revisit`` record referencing it. One digest shuffle;
    only canonical rows carry ``bytes`` into record building, so a
    mirror-heavy corpus archives at the size of its distinct content."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from frontera_spark import STATE_CRAWLED
    from frontera_spark.sources.warc import (
        WARC_TEST_DATE,
        warc_record,
        warc_revisit_record,
        write_warc,
    )

    crawled = (
        frontier_df.filter(F.col("state") == STATE_CRAWLED)
        .select("canonical_url")
        .distinct()
    )
    host = (
        F.col("host")
        if "host" in corpus_df.columns
        else F.split(F.split("url", "//")[1], "/")[0].alias("host")
    )
    pages = corpus_df.select(
        F.col("url").alias("canonical_url"), "bytes", "fmt", host
    )
    hit = pages.join(F.broadcast(crawled), "canonical_url")
    if n_parts:
        hit = hit.repartition(n_parts, "host")
    d = F.lit(date or WARC_TEST_DATE)
    ctype = F.concat(F.lit("image/"), F.col("fmt"))
    if not dedup:
        recs = hit.select(
            warc_record(F.col("canonical_url"), F.col("bytes"), ctype, d).alias("record")
        )
        return write_warc(recs, output, index=True)

    digest = F.concat(F.lit("sha1:"), F.sha1("bytes"))
    tagged = hit.withColumn("digest", digest).withColumn(
        "first_url", F.min("canonical_url").over(Window.partitionBy("digest"))
    )
    full = tagged.filter(F.col("canonical_url") == F.col("first_url")).select(
        warc_record(F.col("canonical_url"), F.col("bytes"), ctype, d).alias("record")
    )
    revisits = tagged.filter(F.col("canonical_url") != F.col("first_url")).select(
        warc_revisit_record(
            F.col("canonical_url"), F.col("first_url"), F.col("digest"), d
        ).alias("record")
    )
    return write_warc(full.unionByName(revisits), output, index=True)


def main() -> None:
    ap = argparse.ArgumentParser(description="WARC archive of a crawl, cluster-submittable.")
    ap.add_argument("--workdir", help="crawl workdir (frontier snapshot tables)")
    ap.add_argument("--corpus", help="corpus parquet path (input_hint schema)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--parts", type=int, default=0, help="repartition count (0 = keep)")
    ap.add_argument("--dedup", action="store_true",
                    help="archive duplicate payloads as revisit records")
    ap.add_argument("--n-images", type=int, default=60,
                    help="smoke-mode corpus size when --workdir is omitted")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("frontera-spark-warc-archive")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        if args.workdir:
            from frontera_spark.core.frontier import FrontierEngine

            eng = FrontierEngine(spark, args.workdir)
            frontier, corpus_path = eng.table.read(), args.corpus
        else:  # smoke mode: crawl a synthetic corpus end to end first
            import tempfile

            from frontera_spark.sources.corpus import url_of, write_corpus
            from frontera_spark.streaming.loop import CrawlLoop

            tmp = tempfile.mkdtemp(prefix="warc_smoke_")
            corpus_path = os.path.join(tmp, "corpus")
            write_corpus(spark, corpus_path, args.n_images, 7, 11)
            loop = CrawlLoop(spark, os.path.join(tmp, "crawl"), corpus_path,
                             corpus_seed=11, batch_size=32, n_partitions=2)
            loop.add_seeds([url_of(0, 7)])
            loop.run()
            frontier = loop.engine.table.read()
        corpus = spark.read.parquet(corpus_path or args.corpus)
        manifest = archive_crawled(spark, frontier, corpus, args.output,
                                   n_parts=args.parts, dedup=args.dedup)
        print(json.dumps({
            "parts": int(len(manifest)),
            "records": int(manifest["n_records"].sum()),
            "bytes": int(manifest["n_bytes"].sum()),
            "output": args.output,
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
