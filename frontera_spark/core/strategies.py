"""Crawling strategies as declarative ordering specs.

Reference: frontera's memory-backend heap comparators + crawling strategies
(frontera/contrib/backends/memory/__init__.py:~40-120, frontera/strategy/
depth.py:~1-60, basic.py). A strategy here is not imperative callback code but
a named *column ordering* the scheduler window sorts by, plus a score
expression — the whole BFS/DFS/FIFO/LIFO behavior space collapses into
``ORDER BY`` clauses Catalyst can plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Strategy:
    name: str

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


STRATEGIES = {n: Strategy(n) for n in ("fifo", "lifo", "bfs", "dfs", "random")}
