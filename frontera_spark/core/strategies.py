"""Crawling strategies as declarative ordering specs — plus the user
extension surface (E1/P6).

Reference: frontera's memory-backend heap comparators + crawling strategies
(frontera/contrib/backends/memory/__init__.py:~40-120, frontera/strategy/
depth.py:~1-60, basic.py) and the ``BaseCrawlingStrategy`` hook surface
(frontera/strategy/__init__.py:~1-150: ``schedule(request, score)``,
``filter_extracted_links``). A strategy here is not imperative callback code
but a named *column ordering* the scheduler window sorts by, plus a score
expression and an optional link predicate — the whole strategy behavior
space collapses into ``ORDER BY`` / ``WHERE`` clauses Catalyst can plan.

Users extend by instantiating :class:`CustomStrategy` (no engine edits):

    hot_small = CustomStrategy(
        name="short_first",
        ordering_fn=lambda it: [F.length("canonical_url").asc(), F.col("seq").asc()],
        score_expr=1.0 / (F.length("canonical_url") + 1.0),
        link_filter=~F.col("canonical_url").contains("/logout"),
        pandas_order_fn=lambda it: (F.length("canonical_url").cast("long"), F.col("seq")),
    )
    FrontierEngine(spark, wd, strategy=hot_small)

``ordering_fn`` receives the iteration number (for per-iteration
pseudo-random orders); ``link_filter`` is applied to extracted links after
canonicalization (columns available: url, canonical_url, host, depth) —
frontera's ``filter_extracted_links``; ``pandas_order_fn`` must return TWO
ascending **integral** (long-castable) sort columns — the politeness walk's
robots cutoff stores them as int64, so doubles/strings are rejected at pop
time — and is only required when the strategy is used with the politeness
scheduler's pandas walk.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, ClassVar, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Strategy:
    name: str

    # OPIC-style strategies flip this on: extracted links then carry a
    # ``_cash`` column and the engine's MERGE accumulates it into ``score``
    # for already-queued children (plain strategies score rows statically)
    accumulates_cash: ClassVar[bool] = False

    def ordering(self, iteration: int = 0) -> list[Column]:
        """Pop-priority ORDER BY columns (ties broken by seq = discovery order)."""
        if self.name == "fifo":
            return [F.col("seq").asc()]
        if self.name == "lifo":
            return [F.col("seq").desc()]
        if self.name == "bfs":
            return [F.col("depth").asc(), F.col("seq").asc()]
        if self.name == "dfs":
            return [F.col("depth").desc(), F.col("seq").asc()]
        if self.name == "random":
            # deterministic pseudo-random: reshuffles each iteration, seeded
            return [F.xxhash64(F.col("canonical_url"), F.lit(iteration)).asc()]
        raise ValueError(f"unknown strategy {self.name}")

    def score(self) -> Column:
        """Informational score in [0,1] (frontera BFS strategy: f(depth))."""
        if self.name in ("bfs", "fifo", "random"):
            return 1.0 / (F.col("depth") + 1.0)
        if self.name in ("dfs", "lifo"):
            return 1.0 - 1.0 / (F.col("depth") + 2.0)
        raise ValueError(self.name)

    def filter_links(self, df: DataFrame) -> DataFrame:
        """``filter_extracted_links`` hook (P6) — default: pass-through."""
        return df

    def pandas_order(self, iteration: int = 0) -> tuple[Column, Column]:
        """Two ASCENDING sort columns equivalent to :meth:`ordering` — the
        politeness walk sorts pandas frames by these (strategy-agnostic)."""
        if self.name == "fifo":
            return F.lit(0).cast("long"), F.col("seq")
        if self.name == "lifo":
            return F.lit(0).cast("long"), -F.col("seq")
        if self.name == "bfs":
            return F.col("depth").cast("long"), F.col("seq")
        if self.name == "dfs":
            return -F.col("depth").cast("long"), F.col("seq")
        if self.name == "random":
            return (
                F.xxhash64(F.col("canonical_url"), F.lit(iteration)),
                F.lit(0).cast("long"),
            )
        raise ValueError(self.name)


@dataclass(frozen=True)
class OpicStrategy(Strategy):
    """OPIC as the live frontier prioritizer (Abiteboul, Preda & Cobena,
    WWW'03 — "crawl the page holding the most cash"), the online scorer
    frontera deployments paired with ``BaseCrawlingStrategy.schedule(request,
    score)`` (frontera/strategy/__init__.py:~100-120).

    The ``score`` column IS the page's cash ledger: seeds enter with 1.0;
    when a page is fetched, its pop-time cash splits equally over its
    out-links (the crawl loop prices ``_cash = parent_score / outdeg`` per
    extracted link); fresh children insert with their summed in-batch cash,
    and cash addressed to already-known pages ACCUMULATES via the table
    layer's add_cols merge. The pop serves highest-cash-first — no
    convergence phase, usable after any prefix of the crawl (the property
    that made OPIC the online choice over PageRank).

    Dangling pages (no out-links) retire their cash: the batch variant's
    virtual-page redistribution would touch every frontier row per
    iteration — O(table) at 10^10 rows — and only rescales the greedy
    ordering; ``operators.pipeline.opic`` keeps the mass-conserving batch
    semantics for offline importance.
    """

    name: str = "opic"
    accumulates_cash: ClassVar[bool] = True

    def ordering(self, iteration: int = 0) -> list[Column]:
        return [F.col("score").desc(), F.col("seq").asc()]

    def score(self) -> Column:
        """Insert-time cash: the link's ``_cash`` (seeds/paths without a
        cash column are stamped 1.0 by the engine before this runs)."""
        return F.col("_cash")

    def pandas_order(self, iteration: int = 0) -> tuple[Column, Column]:
        # integral encoding for the politeness walk's int64 order keys:
        # cash is bounded by total seed mass, so 1e12 quantization fits
        # int64 up to ~9.2M seeds of unit cash
        return -F.floor(F.col("score") * F.lit(1e12)).cast("long"), F.col("seq")


@dataclass(frozen=True)
class CustomStrategy(Strategy):
    """User-defined strategy: ordering + score (+ optional link filter)."""

    name: str = "custom"
    ordering_fn: Optional[Callable[[int], list[Column]]] = None
    score_expr: Optional[Column] = None
    link_filter: Optional[Column] = None
    pandas_order_fn: Optional[Callable[[int], tuple[Column, Column]]] = None

    def ordering(self, iteration: int = 0) -> list[Column]:
        if self.ordering_fn is None:
            raise ValueError(f"CustomStrategy {self.name!r} needs ordering_fn")
        return self.ordering_fn(iteration)

    def score(self) -> Column:
        if self.score_expr is None:
            return 1.0 / (F.col("depth") + 1.0)
        return self.score_expr

    def filter_links(self, df: DataFrame) -> DataFrame:
        if self.link_filter is None:
            return df
        return df.filter(self.link_filter)

    def pandas_order(self, iteration: int = 0) -> tuple[Column, Column]:
        if self.pandas_order_fn is None:
            raise ValueError(
                f"CustomStrategy {self.name!r} needs pandas_order_fn for the "
                "politeness scheduler"
            )
        return self.pandas_order_fn(iteration)


STRATEGIES = {n: Strategy(n) for n in ("fifo", "lifo", "bfs", "dfs", "random")}
STRATEGIES["opic"] = OpicStrategy()
