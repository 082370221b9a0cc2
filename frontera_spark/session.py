"""SparkSession factory with scale-appropriate defaults.

Designed for multi-executor clusters (spark-submit --py-files); tests run the
same config on local[N]. All knobs here are standard public Spark confs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "frontera_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults favor the 100 TB design point: AQE on (runtime coalescing +
    skew-join splitting), broadcast threshold generous for dim tables, Arrow
    on for every pandas-UDF stage, and a shuffle-partition count sized to the
    parallelism (overridable — on a real cluster set ~2-3x total cores).
    """
    # Make the package importable in Python workers regardless of driver cwd.
    # Local mode: workers inherit PYTHONPATH from the (driver) JVM process.
    # Real clusters ship the package via spark-submit --py-files instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if pkg_root not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([pkg_root] + [p for p in parts if p])

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local[N] → N; a real cluster should pass an explicit value.
        n = master[len("local[") : -1] if master.startswith("local[") else ""
        shuffle_partitions = cpus if n in ("*", "") else int(n)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # image `bytes` columns balloon Arrow batches; keep batches bounded
        # (SURVEY.md §7.4.4)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
