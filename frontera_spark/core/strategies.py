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

import re
from dataclasses import dataclass
from typing import Callable, ClassVar, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = "[^a-z0-9]+"


def query_tokens(query: str) -> list[str]:
    """Distinct lowercase alphanumeric tokens of a focus query, sorted —
    the one tokenizer both the Spark relevance expression and the Python
    oracle use, so relevance fractions agree bit-exactly."""
    return sorted({t for t in re.split(_TOKEN_SPLIT, query.lower()) if t})


def relevance_py(text: str, qtokens: list[str]) -> float:
    """|tokens(text) ∩ qtokens| / |qtokens| — the Python mirror of
    :meth:`FocusedStrategy.relevance` (identical single division, so the
    result is the same IEEE double the Spark expression produces)."""
    toks = {t for t in re.split(_TOKEN_SPLIT, text.lower()) if t}
    return len(toks & set(qtokens)) / float(len(qtokens))


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

    # ---- link-cash pricing surface (strategies with accumulates_cash) ----
    # The crawl loop prices each extracted link off its parent's pop-time
    # row: ``parent_cash_frame`` supplies a per-parent (seq, score) frame and
    # ``link_cash`` turns that score + the parent's out-degree into the
    # link's ``_cash``. Defaults implement OPIC (cash splits over
    # out-links); FocusedStrategy overrides both. ``price_links_py`` is the
    # single-threaded mirror core/tester.py uses.

    def parent_cash_frame(self, feed: DataFrame, results: DataFrame) -> DataFrame:
        """(seq, score) pricing frame for this batch's parents — default:
        the feed's pop-time scores (OPIC's cash ledger)."""
        return feed.select("seq", "score")

    def link_cash(self, pscore: Column, nout: Column) -> Column:
        """Per-link cash from parent score + out-degree (OPIC: split)."""
        return pscore / nout

    def price_links_py(self, pop_score: float, nout: int, text: str = "") -> float:
        return pop_score / nout


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
class FocusedStrategy(OpicStrategy):
    """Focused (topic-directed) crawling — the shark-search family
    (Hersovici et al., WWW8 '98; cf. Chakrabarti's focused crawler,
    WWW8 '99), the strategy tier frontera deployments built on
    ``BaseCrawlingStrategy.schedule(request, score)`` with a hand-rolled
    relevance model (frontera/strategy/__init__.py:~100-120 gives the
    hook; frontera itself ships no relevance scorer).

    Frontier priority = *anticipated relevance* inherited from the link's
    parents. When a page is fetched, its relevance is measured from the
    CAPTION the fetch decoded (token overlap with ``query`` — deterministic,
    vocabulary-free), and every extracted link inherits

        cash = decay * (gamma * rel(parent_caption)
                        + (1 - gamma) * parent_inherited_score)

    — shark-search's depth-decayed blend of the parent's own relevance and
    the relevance it inherited. Links are NOT divided by out-degree (unlike
    OPIC): a relevant hub funds each child at full strength. Cash addressed
    to an already-queued child ACCUMULATES (sum over parents — the one
    deviation from shark-search's max, chosen because it rides the engine's
    existing additive-cash MERGE and keeps multi-parent evidence additive);
    seeds enter at 1.0 so the crawl starts breadth-greedy until real
    relevance signal arrives.

    With dyadic ``decay``/``gamma`` and a power-of-two query-token count,
    every cash value is an exact binary fraction — engine and single-thread
    oracle orders then compare bit-exactly (same trick as the OPIC tests).
    """

    name: str = "focused"
    query: str = ""
    decay: float = 0.5
    gamma: float = 0.5

    def __post_init__(self):
        if not query_tokens(self.query):
            raise ValueError("FocusedStrategy needs a non-empty query")

    def relevance(self, text: Column) -> Column:
        """|tokens(text) ∩ query tokens| / |query tokens| in [0, 1] — pure
        codegen (split + array_intersect), no UDF."""
        q = query_tokens(self.query)
        inter = F.array_intersect(
            F.split(F.lower(text), _TOKEN_SPLIT), F.array(*[F.lit(t) for t in q])
        )
        return F.size(inter) / F.lit(float(len(q)))

    def cash_of(self, rel: Column, inherited: Column) -> Column:
        """The shark-search pricing formula as a column (shared by the live
        loop and the driver query so both exercise one code path)."""
        return F.lit(self.decay) * (
            F.lit(self.gamma) * rel + F.lit(1.0 - self.gamma) * inherited
        )

    def parent_cash_frame(self, feed: DataFrame, results: DataFrame) -> DataFrame:
        """Parent pricing joins the fetch results' captions (relevance
        source) with the feed's pop-time scores (inheritance source) — a
        batch×batch broadcast join, no shuffle."""
        joined = results.select("seq", "caption").join(
            F.broadcast(feed.select("seq", "score")), "seq"
        )
        cash = self.cash_of(self.relevance(F.col("caption")), F.col("score"))
        return joined.select("seq", cash.alias("score"))

    def link_cash(self, pscore: Column, nout: Column) -> Column:
        """Full-strength inheritance: every child gets the parent's priced
        cash (no out-degree split)."""
        return pscore

    def price_links_py(self, pop_score: float, nout: int, text: str = "") -> float:
        rel = relevance_py(text, query_tokens(self.query))
        return self.decay * (self.gamma * rel + (1.0 - self.gamma) * pop_score)


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
