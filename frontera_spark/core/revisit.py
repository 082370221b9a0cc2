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


# --------------------------------------------------------- incremental fold
#
# ``fetchlog_schedule`` recomputes over the FULL fetch log each tick —
# exact, but O(total fetch history) with a per-page sort window, which a
# long-running revisiting crawl pays again every tick as the log grows
# without bound. The pair below is the constant-per-tick formulation: all
# the policy ever reads of a page's history is a FIXED per-page summary
# (last signature, change count, first/last change iteration, trailing
# unchanged tail), and that summary folds associatively — state ⊕ new
# fetch slice → state — so each tick touches only the iterations appended
# since the last tick. ``state_schedule(fold(...))`` is pinned bit-equal to
# ``fetchlog_schedule(full log)`` by tests and by the ``revisit_fold``
# driver oracle (same SQL as ``revisit_backoff``).

#: per-page summary the fold maintains (page key + partition_id first):
#:   last_it      — newest fetched iteration
#:   last_sig     — its content signature (the next slice's boundary lag)
#:   n_changes    — lifetime observed changes (consecutive-sig diffs)
#:   first_chg_it / last_chg_it — change-span endpoints (adaptive estimator)
#:   tail         — fetch rows strictly after the last change (= all rows
#:                  while no change yet); backoff exponent = max(tail-1, 0)
REVISIT_STATE_DDL = (
    "fingerprint long, partition_id int, last_it long, last_sig long, "
    "n_changes long, first_chg_it long, last_chg_it long, tail long"
)


def fold_fetch_slice(
    state: DataFrame | None,
    fetch_slice: DataFrame,
    page_col: str = "fingerprint",
    it_col: str = "iteration",
    sig_col: str = "sig",
) -> DataFrame:
    """Fold a NEW fetch-log slice into the per-page revisit state.

    ``fetch_slice`` — (page_col, partition_id, it_col, sig_col) rows for
    iterations STRICTLY NEWER than anything already folded (the caller
    tracks the high-water iteration; out-of-order slices would corrupt the
    lag boundary). ``state`` — prior REVISIT_STATE_DDL rows, or None on the
    first fold; only rows for the slice's pages are read, so pass a
    key-pruned subset at scale. Returns folded state rows for the SLICE's
    pages only (untouched pages keep their rows via the caller's MERGE).

    Scale shape: one window over the slice (not the history), one hash agg,
    one slice-sized left join against the pruned state — O(slice) per tick
    regardless of crawl age.
    """
    w = Window.partitionBy(page_col).orderBy(it_col)
    st = state
    if st is None:
        spark = fetch_slice.sparkSession
        st = spark.createDataFrame([], REVISIT_STATE_DDL)
    st = st.select(
        F.col("fingerprint").alias(page_col) if page_col != "fingerprint" else F.col(page_col),
        F.col("last_sig").alias("_st_sig"),
        F.col("n_changes").alias("_st_n"),
        F.col("first_chg_it").alias("_st_first"),
        F.col("last_chg_it").alias("_st_last_chg"),
        F.col("tail").alias("_st_tail"),
    )
    rows = (
        fetch_slice.withColumn("_prev_in", F.lag(sig_col).over(w))
        .withColumn("_rn", F.row_number().over(w))
        .join(st, page_col, "left")
    )
    prev = F.coalesce(F.col("_prev_in"), F.col("_st_sig"))
    chg = prev.isNotNull() & (prev != F.col(sig_col))
    agg = rows.groupBy(page_col).agg(
        F.first("partition_id").alias("partition_id"),
        F.first("_st_n").alias("_st_n"),
        F.first("_st_first").alias("_st_first"),
        F.first("_st_last_chg").alias("_st_last_chg"),
        F.first("_st_tail").alias("_st_tail"),
        F.max(it_col).alias("last_it"),
        F.max_by(F.col(sig_col), F.col(it_col)).alias("last_sig"),
        F.sum(chg.cast("long")).alias("_n_new"),
        F.min(F.when(chg, F.col(it_col))).alias("_first_new"),
        F.max(F.when(chg, F.col(it_col))).alias("_last_new"),
        F.count(F.lit(1)).alias("_n_rows"),
        # slice rows strictly after the slice's last change = count minus
        # the change row's position (all rows when the slice has no change)
        F.max(F.when(chg, F.col("_rn"))).alias("_last_chg_rn"),
    )
    z = F.lit(0).cast("long")
    return agg.select(
        F.col(page_col).alias("fingerprint") if page_col != "fingerprint" else F.col(page_col),
        "partition_id",
        "last_it",
        "last_sig",
        (F.coalesce("_st_n", z) + F.col("_n_new")).alias("n_changes"),
        F.coalesce("_st_first", "_first_new").alias("first_chg_it"),
        F.coalesce("_last_new", "_st_last_chg").alias("last_chg_it"),
        F.when(F.col("_n_new") > 0, F.col("_n_rows") - F.col("_last_chg_rn"))
        .otherwise(F.coalesce("_st_tail", z) + F.col("_n_rows"))
        .alias("tail"),
    )


def state_schedule(
    state: DataFrame,
    base_interval_s: int | None = None,
    max_backoff_exp: int = 16,
    page_col: str = "fingerprint",
) -> DataFrame:
    """``fetchlog_schedule`` computed from folded REVISIT_STATE rows instead
    of the raw log — same output contract (page, n_changes, path, due_us),
    bit-equal by construction: the state columns are exactly the aggregates
    the full-log policy reduces the history to. No window, no join: two
    filters and pure integer projections over O(pages-in-state) rows."""
    src = state.select(F.col("fingerprint").alias(page_col), *state.columns[1:]) if (
        page_col != "fingerprint"
    ) else state
    adaptive = src.filter(
        (F.col("n_changes") >= 2) & (F.col("last_chg_it") > F.col("first_chg_it"))
    ).select(
        F.col(page_col),
        F.col("n_changes").cast("bigint").alias("n_changes"),
        F.lit("adaptive").alias("path"),
        (
            F.col("last_chg_it") * F.lit(1_000_000)
            + F.expr("((last_chg_it - first_chg_it) * 1000000) div (n_changes - 1)")
        ).cast("bigint").alias("due_us"),
    )
    if base_interval_s is None:
        return adaptive
    exp = F.least(
        F.greatest(F.col("tail") - F.lit(1), F.lit(0).cast("long")),
        F.lit(int(max_backoff_exp)).cast("long"),
    )
    backoff = src.filter(F.col("n_changes") < 2).select(
        F.col(page_col),
        F.col("n_changes").cast("bigint").alias("n_changes"),
        F.lit("backoff").alias("path"),
        (
            (
                F.col("last_it")
                + F.lit(int(base_interval_s)) * F.pow(F.lit(2.0), exp).cast("long")
            )
            * F.lit(1_000_000)
        ).cast("bigint").alias("due_us"),
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
