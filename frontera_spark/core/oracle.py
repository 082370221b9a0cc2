"""Single-threaded reference oracle for frontier semantics.

An executable stand-in for the reference's memory backend + FrontierTester
(frontera/contrib/backends/memory/__init__.py:~1-300, frontera/utils/
tester.py:~1-150, tests/backends.py): a heap + dict-states model whose
emitted URL order IS the expected sequence the Spark engine must reproduce
in single-partition "sequence mode", and whose final seen set must match
exactly in every mode.

Pop orderings (frontera memory-backend heap comparators,
memory/__init__.py:~40-120 + utils/heap.py):
    FIFO  : seq asc
    LIFO  : seq desc
    BFS   : (depth asc, seq asc)
    DFS   : (depth desc, seq asc)
``seq`` is the global insertion order into the queue (discovery order).

No Spark imports here — pure Python, deliberately boring.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

from frontera_spark.functions.urls import canonicalize_url

NOT_CRAWLED, QUEUED, CRAWLED, ERROR, SKIPPED_ROBOTS = 0, 1, 2, 3, 4

ORDERINGS = {
    "fifo": lambda depth, seq: (seq,),
    "lifo": lambda depth, seq: (-seq,),
    "bfs": lambda depth, seq: (depth, seq),
    "dfs": lambda depth, seq: (-depth, seq),
}


@dataclass
class OracleFrontier:
    """Heap+dict model of one crawl frontier."""

    strategy: str = "bfs"
    max_depth: int | None = None
    max_url_length: int = 2048
    robots_deny_hosts: frozenset = frozenset()
    max_per_host: int | None = None

    seq: int = 0
    states: dict = field(default_factory=dict)  # canonical_url -> state
    depths: dict = field(default_factory=dict)
    heap: list = field(default_factory=list)

    def _host(self, url: str) -> str:
        from urllib.parse import urlsplit

        return urlsplit(url).netloc.partition(":")[0].lower()

    def _schedule(self, url: str, depth: int) -> None:
        canon = canonicalize_url(url)
        if len(canon) > self.max_url_length:
            return
        if self.max_depth is not None and depth > self.max_depth:
            return
        if canon in self.states:
            return  # dedup: NOT_CRAWLED-only scheduling (frontera strategy/basic.py)
        if self._host(canon) in self.robots_deny_hosts:
            self.states[canon] = SKIPPED_ROBOTS
            return
        self.states[canon] = QUEUED
        self.depths[canon] = depth
        key = ORDERINGS[self.strategy](depth, self.seq)
        heapq.heappush(self.heap, (key, self.seq, canon))
        self.seq += 1

    def add_seeds(self, urls: list[str]) -> None:
        for u in urls:
            self._schedule(u, 0)

    def get_next_requests(self, max_n: int) -> list[str]:
        """Destructive top-k pop, optional per-host cap within the batch."""
        batch: list[str] = []
        skipped: list = []
        per_host: dict[str, int] = {}
        while self.heap and len(batch) < max_n:
            key, seq, url = heapq.heappop(self.heap)
            host = self._host(url)
            if self.max_per_host is not None and per_host.get(host, 0) >= self.max_per_host:
                skipped.append((key, seq, url))
                continue
            per_host[host] = per_host.get(host, 0) + 1
            batch.append(url)
        for item in skipped:
            heapq.heappush(self.heap, item)
        return batch

    def page_crawled(self, url: str) -> None:
        self.states[canonicalize_url(url)] = CRAWLED

    def links_extracted(self, parent_url: str, links: list[str]) -> None:
        parent_depth = self.depths.get(canonicalize_url(parent_url), 0)
        for link in links:
            self._schedule(link, parent_depth + 1)

    def request_error(self, url: str) -> None:
        self.states[canonicalize_url(url)] = ERROR


def crawl_sequence(
    graph: dict[str, list[str]],
    seeds: list[str],
    strategy: str,
    max_next_requests: int,
    max_iterations: int = 10_000,
    **kwargs,
) -> tuple[list[str], dict]:
    """Run a full simulated crawl; return (fetch order, final states).

    ``graph`` maps canonical URL -> out-links (the downloader simulator,
    frontera/utils/tester.py semantics: every fetch succeeds, links of a
    batch are ingested page by page in batch order).
    """
    f = OracleFrontier(strategy=strategy, **kwargs)
    f.add_seeds(seeds)
    order: list[str] = []
    for _ in range(max_iterations):
        batch = f.get_next_requests(max_next_requests)
        if not batch:
            break
        for url in batch:
            f.page_crawled(url)
            order.append(url)
        for url in batch:
            f.links_extracted(url, graph.get(url, []))
    return order, dict(f.states)
