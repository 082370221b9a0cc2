"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``frontera_spark.operators.driver_queries`` — one
(Spark callable, ANSI-SQL oracle) pair per operator from SURVEY.md §2 plus
the training-data pipeline ops (dedup / similarity / text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: seed-ingest projection → exact dedup → per-host top-k batch
    shaping over sf0.001 (the frontier scheduling core, one plan)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from frontera_spark.operators.driver_queries import _host, _t, _url

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    links = docs.select(
        F.col("doc_id"),
        _url().alias("url"),
        _host().alias("host"),
        F.md5(F.encode(_url(), "utf-8")).alias("fingerprint"),
        F.col("n_chars").alias("score"),
    )
    states = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.md5(F.encode(_url(), "utf-8")).alias("fingerprint")
    )
    fresh = links.join(states, "fingerprint", "left_anti")
    w = Window.partitionBy("host").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fresh.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "url", "host", "fingerprint", "score", "rk")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from frontera_spark.operators.driver_queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from frontera_spark.operators.driver_queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
