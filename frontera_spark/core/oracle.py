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
    OPIC  : (cash desc, seq asc) — greedy highest-cash-first with additive
            cash accrual (Abiteboul et al., WWW'03; frontera's
            ``schedule(request, score)`` online-prioritizer surface). Cash
            updates re-push a fresh heap entry; stale entries (key no longer
            matching the page's current cash) are skipped lazily at pop.
    FOCUSED: same cash-ordered heap, shark-search link pricing — each link
            inherits decay*(gamma*rel(parent text) + (1-gamma)*inherited)
            at full strength (strategies.FocusedStrategy; ``focused=``
            config carries query/decay/gamma/texts).
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
    """Heap+dict model of one crawl frontier.

    ``politeness`` maps host -> dict(delay_s, budget, robots_allow) and turns
    on the token-bucket scheduler model (the OverusedBuffer + politeness-delay
    analogue, frontera/core/__init__.py:~20-120): tokens accrue at 1/delay_s
    per second of the deterministic clock (t = iteration * batch_period),
    capped at ``token_cap``; a throttled host's URLs stay queued while other
    hosts are served; ``budget`` is a lifetime fetch cap per host;
    ``robots_allow=False`` hosts are marked SKIPPED_ROBOTS at pop time.
    """

    strategy: str | object = "bfs"  # name, or callable (url, depth, seq) -> key
    link_filter: object = None  # callable (url, depth) -> bool (E1/P6 hook)
    max_depth: int | None = None
    max_url_length: int = 2048
    robots_deny_hosts: frozenset = frozenset()
    max_per_host: int | None = None
    politeness: dict | None = None
    token_cap: float = 8.0

    seq: int = 0
    states: dict = field(default_factory=dict)  # canonical_url -> state
    depths: dict = field(default_factory=dict)
    heap: list = field(default_factory=list)
    tokens: dict = field(default_factory=dict)  # host -> (tokens, last_refill)
    fetched: dict = field(default_factory=dict)  # host -> lifetime count
    cash: dict = field(default_factory=dict)  # cash strategies: url -> cash
    seqs: dict = field(default_factory=dict)  # cash strategies: url -> seq
    pop_cash: dict = field(default_factory=dict)  # cash at pop time
    # focused crawl config: {"query": str, "decay": float, "gamma": float,
    # "texts": {canonical_url: page text}} — see strategies.FocusedStrategy
    focused: dict | None = None

    @property
    def _opic(self) -> bool:
        """True for cash-ordered strategies (opic and focused share the
        greedy highest-cash-first heap; only link pricing differs)."""
        return self.strategy in ("opic", "focused")

    def _host(self, url: str) -> str:
        from urllib.parse import urlsplit

        return urlsplit(url).netloc.partition(":")[0].lower()

    def _schedule(self, url: str, depth: int, cash_in: float = 1.0) -> None:
        canon = canonicalize_url(url)
        if len(canon) > self.max_url_length:
            return
        if self.max_depth is not None and depth > self.max_depth:
            return
        if self.link_filter is not None and not self.link_filter(canon, depth):
            return  # strategy filter_extracted_links: silently dropped
        if canon in self.states:
            # dedup: NOT_CRAWLED-only scheduling (frontera strategy/basic.py)
            # — but OPIC cash still accrues on the known page; a QUEUED page
            # re-keys via a fresh heap entry (old entries go stale)
            if self._opic:
                self.cash[canon] = self.cash.get(canon, 0.0) + cash_in
                if self.states[canon] == QUEUED:
                    heapq.heappush(
                        self.heap, ((-self.cash[canon],), self.seqs[canon], canon)
                    )
            return
        if self._host(canon) in self.robots_deny_hosts:
            self.states[canon] = SKIPPED_ROBOTS
            return
        self.states[canon] = QUEUED
        self.depths[canon] = depth
        if self._opic:
            self.cash[canon] = cash_in
            self.seqs[canon] = self.seq
            key = (-cash_in,)
        else:
            key = (
                ORDERINGS[self.strategy](depth, self.seq)
                if isinstance(self.strategy, str)
                else self.strategy(canon, depth, self.seq)
            )
        heapq.heappush(self.heap, (key, self.seq, canon))
        self.seq += 1

    def add_seeds(self, urls: list[str]) -> None:
        for u in urls:
            self._schedule(u, 0)

    def _host_allowance(self, host: str, t_now: float) -> float:
        """Refill this host's token bucket to clock t_now; return spendable
        tokens (inf when the host has no politeness entry)."""
        cfg = (self.politeness or {}).get(host)
        if cfg is None:
            return float("inf")
        if not cfg.get("robots_allow", True):
            return -1.0  # sentinel: robots-denied at pop time
        toks, last = self.tokens.get(host, (self.token_cap, 0.0))
        delay = cfg.get("delay_s") or 0.0
        if delay > 0:
            toks = min(self.token_cap, toks + (t_now - last) / delay)
        else:
            toks = self.token_cap
        self.tokens[host] = (toks, t_now)
        budget = cfg.get("budget")
        if budget is not None:
            toks = min(toks, budget - self.fetched.get(host, 0))
        return toks

    def get_next_requests(
        self,
        max_n: int,
        t_now: float = 0.0,
        min_requests: int | None = None,
        min_hosts: int | None = None,
    ) -> list[str]:
        """Destructive top-k pop: per-host cap within the batch, token-bucket
        politeness + budget + robots gating when ``politeness`` is set.
        Throttled/capped items go back on the heap (OverusedBuffer: buffer the
        overused host's requests, serve other hosts). ``min_requests`` /
        ``min_hosts`` are frontera's batch-shaping floors (BC_MIN_REQUESTS /
        BC_MIN_HOSTS): stop at the earliest take meeting both."""
        batch: list[str] = []
        skipped: list = []
        per_host: dict[str, int] = {}
        allowance: dict[str, float] = {}
        floors = min_requests is not None or min_hosts is not None
        while self.heap and len(batch) < max_n:
            key, seq, url = heapq.heappop(self.heap)
            if self.states.get(url) != QUEUED:
                continue  # lazy deletion: url already served/skipped
            if self._opic and key != (-self.cash[url],):
                continue  # stale opic entry: cash accrued since this push
            host = self._host(url)
            if host not in allowance:
                allowance[host] = self._host_allowance(host, t_now)
            if allowance[host] < 0:
                self.states[url] = SKIPPED_ROBOTS  # robots learned post-queue
                continue
            if self.max_per_host is not None and per_host.get(host, 0) >= self.max_per_host:
                skipped.append((key, seq, url))
                continue
            if allowance[host] < 1.0:
                skipped.append((key, seq, url))
                continue
            allowance[host] -= 1.0
            per_host[host] = per_host.get(host, 0) + 1
            if self._opic:
                # engine parity: the loop prices links off the FEED's
                # pop-time score, so capture cash as of the pop — cash that
                # lands between pop and links_extracted doesn't re-price
                self.pop_cash[url] = self.cash.get(url, 1.0)
            batch.append(url)
            if (
                floors
                and len(batch) >= (min_requests or 0)
                and len(per_host) >= (min_hosts or 0)
            ):
                break
        for item in skipped:
            heapq.heappush(self.heap, item)
        for host, n in per_host.items():
            if self.politeness and host in self.politeness:
                toks, last = self.tokens[host]
                self.tokens[host] = (toks - n, last)
                self.fetched[host] = self.fetched.get(host, 0) + n
        return batch

    def can_make_progress(self) -> bool:
        """True if some queued URL can EVENTUALLY be served: its host is not
        robots-denied and has lifetime budget left (tokens always refill given
        enough clock, so budget/robots are the only permanent blocks)."""
        for _key, _seq, url in self.heap:
            if self.states.get(url) != QUEUED:
                continue  # lazy-deleted/stale entry
            cfg = (self.politeness or {}).get(self._host(url))
            if cfg is None:
                return True
            if not cfg.get("robots_allow", True):
                continue
            budget = cfg.get("budget")
            if budget is None or budget - self.fetched.get(self._host(url), 0) >= 1:
                return True
        return False

    def page_crawled(self, url: str) -> None:
        self.states[canonicalize_url(url)] = CRAWLED

    def links_extracted(self, parent_url: str, links: list[str]) -> None:
        canon = canonicalize_url(parent_url)
        parent_depth = self.depths.get(canon, 0)
        share = 1.0
        if self.strategy == "focused" and links:
            # shark-search pricing (strategies.FocusedStrategy): every link
            # inherits decay*(gamma*rel(parent text) + (1-gamma)*inherited)
            # at full strength — no out-degree split
            from frontera_spark.core.strategies import query_tokens, relevance_py

            cfg = self.focused or {}
            rel = relevance_py(
                cfg.get("texts", {}).get(canon, ""), query_tokens(cfg["query"])
            )
            inherited = self.pop_cash.get(canon, self.cash.get(canon, 1.0))
            g = cfg.get("gamma", 0.5)
            share = cfg.get("decay", 0.5) * (g * rel + (1.0 - g) * inherited)
        elif self._opic and links:
            # pop-time cash splits equally over out-links (links later
            # dropped by depth/length/filters retire their share — matching
            # the engine, which prices before _prepare's guards)
            share = self.pop_cash.get(canon, self.cash.get(canon, 1.0)) / len(links)
        for link in links:
            self._schedule(link, parent_depth + 1, cash_in=share)

    def request_error(self, url: str) -> None:
        self.states[canonicalize_url(url)] = ERROR


def crawl_sequence(
    graph: dict[str, list[str]],
    seeds: list[str],
    strategy: str,
    max_next_requests: int,
    max_iterations: int = 10_000,
    batch_period: float = 1.0,
    **kwargs,
) -> tuple[list[str], dict]:
    """Run a full simulated crawl; return (fetch order, final states).

    ``graph`` maps canonical URL -> out-links (the downloader simulator,
    frontera/utils/tester.py semantics: every fetch succeeds, links of a
    batch are ingested page by page in batch order). The politeness clock is
    deterministic: iteration i runs at t = i * batch_period.
    """
    f = OracleFrontier(strategy=strategy, **kwargs)
    f.add_seeds(seeds)
    order: list[str] = []
    for it in range(max_iterations):
        batch = f.get_next_requests(max_next_requests, t_now=it * batch_period)
        if not batch:
            if f.can_make_progress():
                continue  # all hosts throttled this tick; let the clock run
            break
        for url in batch:
            f.page_crawled(url)
            order.append(url)
        for url in batch:
            f.links_extracted(url, graph.get(url, []))
    return order, dict(f.states)
