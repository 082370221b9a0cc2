#!/usr/bin/env bash
# Package the engine and run the crawl loop via spark-submit --py-files
# (the north-rule deployment path). Defaults give a local smoke run; set
# MASTER / SUBMIT_ARGS for a real cluster.
#
#   MASTER=yarn SUBMIT_ARGS="--num-executors 256 --executor-cores 4" \
#     ./submit.sh --n-images 100000 --batch 8192 --partitions 256 \
#     --workdir hdfs:///crawl/run1
set -euo pipefail
cd "$(dirname "$0")"

MASTER="${MASTER:-local[8]}"
ZIP=frontera_spark.zip
rm -f "$ZIP"
python -m zipfile -c "$ZIP" frontera_spark

exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
    --master "$MASTER" \
    --py-files "$ZIP" \
    ${SUBMIT_ARGS:-} \
    jobs/crawl_job.py "$@"
