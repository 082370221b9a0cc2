"""Adaptive revisit scheduling: per-page change-rate estimation (Cho &
Garcia-Molina, "Estimating Frequency of Change", TOIT 2003).

frontera's revisiting backend (frontera/contrib/backends/sqlalchemy/
revisiting.py:~RevisitingQueue) reschedules every crawled page after a FIXED
``SQLALCHEMYBACKEND_REVISIT_INTERVAL`` — the engine's X6 timer
(core/frontier.py, revisit_due) reproduces that. This module adds the
adaptive upgrade a 10^10-URL crawl actually wants: estimate each page's
Poisson change rate from its observed change history and schedule the next
visit one *mean change interval* after the last observation, so fast-moving
pages are revisited often and static ones almost never.

Estimator (the paper's naive frequency estimator, exact for fully-observed
change logs): for a page with ``n >= 2`` observed changes spanning
``span = t_last - t_first``, the mean inter-change gap is ``span/(n-1)`` and
the daily rate is ``(n-1)/span_days``. All timestamp math is integer
microseconds (timestampdiff against the NTZ epoch — timezone-independent and
bit-identical to DuckDB's ``epoch_us``), and the gap division is *integral*
(``div``) so both engines agree exactly; only the reported rate is a rounded
double.

Scale shape: one hash aggregation keyed on the page id (map-side partial
min/max/count), then pure projections — no window, no join, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_US_PER_DAY = 86_400_000_000


def _epoch_us(col: str = "ts"):
    """Integer microseconds since the NTZ epoch (timezone-independent).

    The input is cast to TIMESTAMP_NTZ *inside* the diff: a plain TIMESTAMP
    (LTZ) operand would coerce the NTZ epoch literal through the session
    timezone, shifting the result by the tz offset relative to DuckDB's
    ``epoch_us`` under any non-UTC session — the NTZ cast pins the math to
    the wall clock regardless of ``spark.sql.session.timeZone``."""
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({col} AS TIMESTAMP_NTZ))"
    )


def fetchlog_schedule(
    log: DataFrame,
    base_interval_s: int | None = None,
    max_backoff_exp: int = 16,
    page_col: str = "fingerprint",
    it_col: str = "iteration",
    sig_col: str = "sig",
) -> DataFrame:
    """Per-page revisit due times from a raw FETCH log (one row per fetch:
    page, crawl-clock iteration, content signature) — the complete policy
    the crawl loop's revisit tick applies:

    - pages with >= 2 observed changes (consecutive fetches whose signatures
      differ): ``path='adaptive'`` — the Cho–Garcia-Molina estimate from
      ``change_rate_schedule``, due one mean inter-change gap after the last
      change;
    - everything else (given ``base_interval_s``): ``path='backoff'`` — due
      = last_fetch + base * 2^min(trailing unchanged refetches,
      max_backoff_exp). The naive estimator can never observe changes
      faster than it samples, so a FLAT fallback would pin static pages to
      the same cadence as fast ones forever; exponential backoff is what
      makes "fast pages are re-fetched more often" true.

    Output: (page_col, n_changes bigint, path string, due_us bigint).
    ``base_interval_s=None`` returns the adaptive half only. Iterations
    must be unique per page (one fetch-log row per fetch). ``pow(2, exp)``
    is exact for the exponent cap's range (integers < 2^53).

    Scale shape: one lag window + two hash aggs over the log — no joins
    against the frontier; the caller turns due_us into a partition-pruned
    ``requeue_due`` MERGE.
    """
    w = Window.partitionBy(page_col).orderBy(it_col)
    flagged = log.withColumn("_prev", F.lag(sig_col).over(w)).withColumn(
        "_chg", F.col("_prev").isNotNull() & (F.col("_prev") != F.col(sig_col))
    )
    obs = flagged.filter("_chg").select(
        F.col(page_col), F.timestamp_seconds(F.col(it_col)).alias("_ts")
    )
    adaptive = change_rate_schedule(obs, page_col=page_col, ts_col="_ts").select(
        F.col(page_col),
        "n_changes",
        F.lit("adaptive").alias("path"),
        F.col("next_due_us").alias("due_us"),
    )
    if base_interval_s is None:
        return adaptive
    stats = flagged.groupBy(page_col).agg(
        F.max(it_col).alias("_last_it"),
        F.sum(F.col("_chg").cast("int")).alias("n_changes"),
        F.max(F.when(F.col("_chg"), F.col(it_col))).alias("_last_chg_it"),
    )
    streaks = (
        flagged.join(stats.select(page_col, "_last_chg_it"), page_col)
        .filter(F.col(it_col) > F.coalesce("_last_chg_it", F.lit(-1)))
        .groupBy(page_col)
        .agg((F.count(F.lit(1)) - F.lit(1)).alias("_streak"))
    )
    exp = F.least(
        F.greatest(F.coalesce(F.col("_streak"), F.lit(0)), F.lit(0)),
        F.lit(int(max_backoff_exp)),
    )
    backoff = (
        stats.filter(F.col("n_changes") < 2)
        # LEFT join: a page whose latest fetch observed its first change has
        # no post-change fetches at all — it must still re-queue (streak 0)
        .join(streaks, page_col, "left")
        .select(
            F.col(page_col),
            F.col("n_changes").cast("bigint").alias("n_changes"),
            F.lit("backoff").alias("path"),
            (
                (
                    F.col("_last_it")
                    + F.lit(int(base_interval_s)) * F.pow(F.lit(2.0), exp).cast("long")
                )
                * F.lit(1_000_000)
            ).cast("bigint").alias("due_us"),
        )
    )
    return adaptive.unionByName(backoff)


def change_rate_schedule(
    observations: DataFrame,
    page_col: str = "page_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-page revisit schedule from an observed-change log.

    Input: one row per observed change (page_col, ts_col, ...). Output: one
    row per page with >= 2 changes and a non-zero span —
    ``n_changes`` (bigint), ``last_us`` (bigint, epoch microseconds of the
    newest change), ``rate_per_day`` (double, 4dp), and ``next_due_us``
    (bigint): last_us + span div (n-1), exact integer arithmetic."""
    ep = _epoch_us(ts_col)
    agg = observations.groupBy(F.col(page_col)).agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.min(ep).alias("first_us"),
        F.max(ep).alias("last_us"),
    )
    span = F.col("last_us") - F.col("first_us")
    gaps = F.col("n_changes") - F.lit(1)
    rate = gaps.cast("double") * F.lit(float(_US_PER_DAY)) / span.cast("double")
    return (
        agg.filter((F.col("n_changes") >= 2) & (span > 0))
        .select(
            F.col(page_col),
            "n_changes",
            "last_us",
            (F.floor(rate * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).alias("rate_per_day"),
            (F.col("last_us") + F.expr("(last_us - first_us) div (n_changes - 1)")).alias(
                "next_due_us"
            ),
        )
    )
