"""spark-submit entry point for the composed training-data pipeline.

Reads a documents table (doc_id, text, ...), runs the clean-corpus
composition (exact dedup → MinHash-LSH near-dup dedup → quality filter →
language filter — operators/pipeline.py), writes the clean corpus as
parquet, and prints ONE JSON line of per-stage lineage counts.

Cluster usage (same packaging path as crawl_job.py):

    spark-submit --master <cluster> --py-files frontera_spark.zip \\
        jobs/corpus_pipeline.py --input hdfs://.../documents.parquet \\
        --output hdfs://.../clean --min-quality 0.5 --langs en,de

Local smoke:

    python jobs/corpus_pipeline.py --input /root/testdata/sf0.001/documents.parquet \\
        --output $(mktemp -d)/clean
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local `python jobs/corpus_pipeline.py` puts jobs/ (not the repo root) on
# sys.path; under spark-submit the --py-files zip provides the package instead
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main() -> None:
    ap = argparse.ArgumentParser(description="Clean-corpus pipeline, cluster-submittable.")
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="clean-corpus parquet path")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--langs", default="en", help="comma-separated keep set")
    ap.add_argument("--jaccard-min", type=float, default=0.6)
    ap.add_argument("--master", default=None, help="only set when NOT spark-submitted")
    args = ap.parse_args()

    if args.master:
        from frontera_spark.session import get_spark

        spark = get_spark("corpus_pipeline", master=args.master)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("corpus_pipeline").getOrCreate()

    from frontera_spark.operators.pipeline import clean_corpus

    docs = spark.read.parquet(args.input)
    clean, counts = clean_corpus(
        docs,
        min_quality=args.min_quality,
        langs=tuple(args.langs.split(",")),
        jaccard_min=args.jaccard_min,
    )
    clean.write.mode("overwrite").parquet(args.output)
    print("PIPELINE_DONE " + json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()
