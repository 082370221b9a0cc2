"""spark-submit entry point for the multimodal media-prep pipeline.

Reads an image corpus (the BASELINE input_hint table: image_id, bytes, w,
h, fmt, caption, phash), runs the media stages a training-data prep run
needs — decode + integrity stats (png/jpeg/gif via the magic-byte
dispatcher), phash recompute + exact-duplicate groups, JPEG thumbnails —
writes thumbnails + per-image stats as parquet, and prints ONE JSON line
of per-stage lineage counts. Every stage is an Arrow-batched mapInPandas
over the binary column (operators/multimodal.py); nothing shuffles except
the dup-group aggregate.

Cluster usage (same packaging path as crawl_job.py / corpus_pipeline.py):

    spark-submit --master <cluster> --py-files frontera_spark.zip \\
        jobs/media_pipeline.py --input hdfs://.../corpus.parquet \\
        --output hdfs://.../media --thumb-size 16 --jpeg-quality 85

Local smoke (synthesizes its own corpus when --input is omitted):

    python jobs/media_pipeline.py --n-images 200 --output $(mktemp -d)/media
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main() -> None:
    ap = argparse.ArgumentParser(description="Media-prep pipeline, cluster-submittable.")
    ap.add_argument("--input", help="corpus parquet path (input_hint schema)")
    ap.add_argument("--n-images", type=int, default=200,
                    help="synthesize a corpus of this size when --input is omitted")
    ap.add_argument("--jpeg-share", type=float, default=0.25,
                    help="real-JPEG slice of the synthesized corpus")
    ap.add_argument("--output", required=True, help="output dir (stats/ + thumbs/)")
    ap.add_argument("--thumb-size", type=int, default=16)
    ap.add_argument("--jpeg-quality", type=int, default=85)
    ap.add_argument("--partitions", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from frontera_spark.operators.multimodal import decode_images, resize_images
    from frontera_spark.session import get_spark

    spark = get_spark("media_pipeline")
    if args.input:
        corpus = spark.read.parquet(args.input)
    else:
        from frontera_spark.sources.corpus import generate_corpus

        corpus = generate_corpus(
            spark, args.n_images, jpeg_share=args.jpeg_share
        ).select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    if args.partitions:
        corpus = corpus.repartition(args.partitions)
    corpus = corpus.cache()
    n_in = corpus.count()

    # 1+2. decode + integrity stats + phash recompute in ONE pass over the
    # payload bytes (decoding twice doubles the dominant cost at scale)
    stats = decode_images(corpus, recompute_phash=True)
    stats.write.mode("overwrite").parquet(os.path.join(args.output, "stats"))
    stats_df = spark.read.parquet(os.path.join(args.output, "stats"))
    n_ok = stats_df.where("decode_ok").count()
    n_dim_mismatch = stats_df.where(
        "decode_ok AND (decoded_w != w OR decoded_h != h)"
    ).count()

    # 3. exact-duplicate groups on the recomputed phash (content identity,
    #    not metadata identity) — one hash aggregate
    dup_groups = (
        stats_df.where("decode_ok")
        .groupBy("phash_recomputed")
        .agg(F.count("*").alias("n"))
        .where("n > 1")
        .count()
    )

    # 4. JPEG thumbnails for the decodable rows
    thumbs = resize_images(
        corpus.join(stats_df.where("decode_ok").select("image_id"), "image_id"),
        out_w=args.thumb_size,
        out_h=args.thumb_size,
        out_fmt="jpeg",
        jpeg_quality=args.jpeg_quality,
    )
    thumbs.write.mode("overwrite").parquet(os.path.join(args.output, "thumbs"))
    n_thumbs = spark.read.parquet(os.path.join(args.output, "thumbs")).count()

    corpus.unpersist()
    print(
        json.dumps(
            {
                "n_input": n_in,
                "n_decoded_ok": n_ok,
                "n_decode_failures": n_in - n_ok,
                "n_dim_mismatches": n_dim_mismatch,
                "n_phash_dup_groups": dup_groups,
                "n_thumbnails": n_thumbs,
            }
        )
    )


if __name__ == "__main__":
    main()
