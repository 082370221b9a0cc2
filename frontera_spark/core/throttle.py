"""AIMD politeness throttle — the AutoThrottle idea (scrapy's
AutoThrottle extension / frontera's static ``DOWNLOAD_DELAY``,
settings.py:~40-60) recast as a declarative controller over the
politeness domain table (core/politeness.py).

A static per-host delay is wrong in both directions: too fast for a host
that starts failing (overload, throttling, bans), too slow for one that
is healthy. The classic fix is multiplicative-increase /
additive-decrease on the observed error rate (AIMD — the TCP congestion
rule, which scrapy's AutoThrottle approximates with latency targets):

- a host whose window error rate >= ``err_threshold`` has its delay
  MULTIPLIED by ``backoff`` (kicked up from zero to ``relief_s`` first —
  multiplying an unthrottled host's 0.0 would never move), capped at
  ``max_delay_s``;
- a healthy host's delay decreases by ``relief_s`` per window, floored
  at ``min_delay_s`` — pressure relaxes linearly, never cliff-drops.

``aimd_delay`` is a pure column expression: the crawl loop's throttle
tick applies it to the (already host-partitioned) domain table in one
MERGE, so the controller costs one narrow update per window — no new
state table. Controller state IS the committed ``delay_s`` column; a
crash loses at most the current partial observation window, which a
self-correcting controller re-accumulates (documented loop contract).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def aimd_delay(
    delay: Column,
    n_ok: Column,
    n_err: Column,
    *,
    err_threshold: float = 0.5,
    backoff: float = 2.0,
    relief_s: float = 0.5,
    min_delay_s: float = 0.0,
    max_delay_s: float = 60.0,
) -> Column:
    """New per-host delay from the current delay + one observation window.

    Hosts with an empty window (n_ok + n_err == 0) keep their delay —
    no observation, no adjustment (they were not popped, so their
    pressure is unknown, not zero)."""
    total = n_ok + n_err
    troubled = (total > 0) & (
        n_err.cast("double") / F.nullif(total.cast("double"), F.lit(0.0))
        >= F.lit(float(err_threshold))
    )
    raised = F.least(
        F.greatest(delay * F.lit(float(backoff)), F.lit(float(relief_s))),
        F.lit(float(max_delay_s)),
    )
    relaxed = F.greatest(delay - F.lit(float(relief_s)), F.lit(float(min_delay_s)))
    return (
        F.when(total == 0, delay)
        .when(troubled, raised)
        .otherwise(relaxed)
    )
