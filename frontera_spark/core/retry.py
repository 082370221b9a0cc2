"""Transient-error retry policy: bounded exponential-backoff re-queue of
ERRORED pages.

frontera's strategy surface lets a crawl re-schedule failed requests from
the ``request_error`` hook (frontera/strategy/__init__.py:~100-120
``schedule(request, score)`` called from ``page_error``; its DBWorker keeps
per-request error counters). The engine's spider-log ingestion marks failed
pages ``STATE_ERROR`` terminally — correct for true 404s, wrong for the
timeouts / 5xx / connection resets a 10^10-URL crawl sees at a steady
background rate: dropping those permanently loses coverage, retrying them
forever wastes budget on genuinely dead URLs. The policy here is the
standard bounded exponential backoff: a page's n-th error re-queues it at

    due = last_error_iteration + base_interval_s * 2^min(n-1, max_backoff_exp)

on the deterministic crawl clock, until ``n > max_retries`` — then the page
stays ERROR for good (``action='give_up'``).

Architecture mirrors the revisit policy (core/revisit.py): the per-page
error history reduces to an associative 2-number summary (error count,
last error iteration) that folds incrementally — state ⊕ new error slice →
state — so each tick costs O(new errors), never O(error history); the
schedule is a pure projection over the folded state. ``CrawlLoop`` keeps
the state in a key-partitioned SnapshotTable and applies the schedule with
``FrontierEngine.requeue_due(..., from_state=STATE_ERROR)`` — a
partition-pruned MERGE that flips retryable ERROR rows back to QUEUED at
their per-row ``crawl_at``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-page error summary the fold maintains (key + partition first):
#:   n_errors — lifetime error count (the retry policy's attempt number)
#:   last_it  — newest errored iteration (the backoff base point)
RETRY_STATE_DDL = "fingerprint long, partition_id int, n_errors long, last_it long"


def fold_error_slice(
    state: DataFrame | None,
    error_slice: DataFrame,
    page_col: str = "fingerprint",
    it_col: str = "iteration",
) -> DataFrame:
    """Fold a NEW error-log slice into the per-page retry state.

    ``error_slice`` — (page_col, partition_id, it_col) rows for iterations
    strictly newer than anything already folded; ``state`` — prior
    RETRY_STATE_DDL rows (key-pruned to the slice's pages by the caller at
    scale), or None on the first fold. Returns folded rows for the slice's
    pages only. Unlike the revisit fold there is no cross-row ordering
    dependency — count and max are plainly associative — so this is one
    hash agg plus a slice-sized left join, no window at all.
    """
    st = state
    if st is None:
        st = error_slice.sparkSession.createDataFrame([], RETRY_STATE_DDL)
    st = st.select(
        F.col("fingerprint").alias(page_col)
        if page_col != "fingerprint"
        else F.col(page_col),
        F.col("n_errors").alias("_st_n"),
    )
    agg = error_slice.groupBy(page_col).agg(
        F.first("partition_id").alias("partition_id"),
        F.count(F.lit(1)).alias("_n_new"),
        F.max(it_col).alias("last_it"),
    )
    z = F.lit(0).cast("long")
    return (
        agg.join(st, page_col, "left")
        .select(
            F.col(page_col).alias("fingerprint")
            if page_col != "fingerprint"
            else F.col(page_col),
            "partition_id",
            (F.coalesce("_st_n", z) + F.col("_n_new")).alias("n_errors"),
            F.col("last_it").cast("long").alias("last_it"),
        )
    )


def retry_schedule(
    state: DataFrame,
    max_retries: int = 3,
    base_interval_s: int = 2,
    max_backoff_exp: int = 16,
    page_col: str = "fingerprint",
) -> DataFrame:
    """Per-page retry decisions from folded RETRY_STATE rows.

    Output: (page_col, n_errors bigint, action string, due_us bigint) —
    ``action='retry'`` with ``due_us = (last_it + base * 2^min(n_errors-1,
    max_backoff_exp)) * 1e6`` while ``n_errors <= max_retries``, else
    ``action='give_up'`` with NULL due (the page stays ERROR). All integer
    math (``pow(2, exp)`` exact below 2^53), so a SQL oracle agrees bit-for-
    bit. Pure projection over O(pages-in-state) rows — no join, no window.
    """
    src = (
        state.select(F.col("fingerprint").alias(page_col), *state.columns[1:])
        if page_col != "fingerprint"
        else state
    )
    exp = F.least(
        F.greatest(F.col("n_errors") - 1, F.lit(0).cast("long")),
        F.lit(int(max_backoff_exp)).cast("long"),
    )
    due = (
        (
            F.col("last_it")
            + F.lit(int(base_interval_s)) * F.pow(F.lit(2.0), exp).cast("long")
        )
        * F.lit(1_000_000)
    ).cast("bigint")
    is_retry = F.col("n_errors") <= F.lit(int(max_retries))
    return src.select(
        F.col(page_col),
        F.col("n_errors").cast("bigint").alias("n_errors"),
        F.when(is_retry, F.lit("retry")).otherwise(F.lit("give_up")).alias("action"),
        F.when(is_retry, due).otherwise(F.lit(None).cast("bigint")).alias("due_us"),
    )
