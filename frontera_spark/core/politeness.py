"""Politeness: domain metadata, token buckets, robots gating (SURVEY.md M5).

Reference semantics being reproduced, Spark-first:

- **DomainMetadata / DomainCache** (frontera/core/components.py:~200-230,
  frontera/contrib/backends/hbase/domaincache.py:~1-300): per-host KV with
  batched write-back → here a partitioned ``domain_metadata`` snapshot table,
  MERGE-updated once per micro-batch (the batch IS the write-back flush).
- **OverusedBuffer** (frontera/core/__init__.py:~20-120): when a host is over
  its politeness allowance, buffer its requests and serve other hosts → here
  the throttled host's rows simply stay QUEUED in the frontier (the table is
  the buffer) while the scheduler walk passes over them.
- **Politeness delay / budget**: token bucket per host — tokens accrue at
  1/delay_s per second of the deterministic crawl clock (t = iteration ×
  batch_period), capped at ``token_cap``; ``budget`` is a lifetime fetch cap;
  ``robots_allow=false`` hosts are marked SKIPPED_ROBOTS at pop time (robots
  learned after queueing). Identical logic lives in the pure-Python oracle
  (core/oracle.py) — parity tests pin both.

Scale shape: queued rows and domain rows share partition_id = crc32(host) % P
(Crc32NamePartitioner), so the rows↔policy join is co-partitioned and each
``applyInPandas`` group schedules its partition's hosts with no cross-
partition state — one host is never split across schedulers (politeness needs
no global view). ``mode='global'`` collapses to one group for single-consumer
reference parity.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frontera_spark import STATE_QUEUED, STATE_SKIPPED_ROBOTS
from frontera_spark.core.frontier import FRONTIER_COLS, FrontierEngine
from frontera_spark.functions.fingerprint import partition_id_col

DOMAIN_SCHEMA = (
    "host string, partition_id int, robots_allow boolean, delay_s double, "
    "budget long, tokens double, last_refill double, fetched long"
)

_SCHED_SCHEMA = (
    "fingerprint long, partition_id int, batch_id long, state int, "
    "_emit string, _has_policy boolean, host string, _tokens_after double, "
    "_fetched_after long, _last_refill double, _grp int, _cut1 long, _cut2 long"
)


class DomainMetadata:
    """Partitioned per-host policy + politeness-state table."""

    def __init__(self, spark: SparkSession, workdir: str, n_partitions: int, token_cap: float = 8.0):
        from frontera_spark.plans.snapshot import SnapshotTable

        self.spark = spark
        self.n_partitions = n_partitions
        self.token_cap = token_cap
        path = os.path.join(workdir, "domain_metadata")
        if os.path.exists(os.path.join(path, "CURRENT")):
            self.table = SnapshotTable.load(spark, path)
        else:
            self.table = SnapshotTable.create(spark, path, DOMAIN_SCHEMA, key=["host"])

    def set_policies(self, policies: DataFrame) -> None:
        """MERGE host policies: df(host, robots_allow, delay_s, budget).
        Buckets start full (token_cap) at clock 0."""
        rows = (
            policies.withColumn("partition_id", partition_id_col(F.col("host"), self.n_partitions))
            .withColumn("tokens", F.lit(float(self.token_cap)))
            .withColumn("last_refill", F.lit(0.0))
            .withColumn("fetched", F.lit(0).cast("long"))
            .select(*[c.split()[0] for c in DOMAIN_SCHEMA.split(", ")])
        )
        self.table.upsert(rows)

    def read(self) -> DataFrame:
        return self.table.read()


class PoliteScheduler:
    """Batch generator with per-host token buckets (the DBWorker batch-gen +
    OverusedBuffer stage, frontera/worker/db.py:~150-220 + core/__init__.py)."""

    def __init__(
        self,
        engine: FrontierEngine,
        domains: DomainMetadata,
        batch_period: float = 1.0,
        token_cap: float = 8.0,
    ):
        self.engine = engine
        self.domains = domains
        self.batch_period = batch_period
        self.token_cap = token_cap

    def _ordering_cols(self, df: DataFrame, iteration: int) -> DataFrame:
        """Materialize the strategy ordering as two ascending sort columns so
        the pandas walk needs no strategy-specific code (built-ins and
        CustomStrategy both supply them via Strategy.pandas_order).

        The columns MUST be integral: the walk's robots cutoff captures them
        through int() (``_cut1``/``_cut2``), so a double or string ordering
        column would silently truncate — or crash — the cutoff key and
        corrupt which denied rows get SKIPPED_ROBOTS. Validated here so a
        CustomStrategy.pandas_order_fn returning the wrong type fails loudly
        at pop time, not probabilistically inside the pandas walk."""
        o1, o2 = self.engine.strategy.pandas_order(iteration)
        out = df.withColumn("_ord1", o1).withColumn("_ord2", o2)
        integral = {"byte", "short", "int", "integer", "bigint", "long"}
        for name in ("_ord1", "_ord2"):
            dt = out.schema[name].dataType.simpleString()
            if dt not in integral:
                raise TypeError(
                    f"pandas_order must return integral sort columns; "
                    f"{name} is {dt} (strategy "
                    f"{self.engine.strategy.name!r}) — cast to long"
                )
        return out

    def decide(
        self,
        iteration: int,
        max_n: int,
        max_per_host: int | None = None,
        mode: str = "global",
    ) -> tuple[DataFrame, DataFrame]:
        """The scheduling decision stage (pure — commits nothing).

        Returns ``(walk, denied)``:

        - ``walk``: the token-bucket walk's output, rows tagged ``_emit`` ∈
          {feed, domain, cutoff}. The walk's INPUT is bounded JVM-side first —
          a salted per-host top-K in strategy order, K = the most rows a host
          could possibly serve this pop (min of max_n, max_per_host, and
          ⌈token_cap⌉ for policied hosts). This is exact, not approximate: a
          host's served rows are always a PREFIX of its strategy-ordered
          queue (allowance only decreases within a pop), so rows beyond K
          could only ever be skipped — same outcome as pruning them. Turns
          the pandas stage from O(frontier) to O(hosts × K) per pop.
        - ``denied``: robots-denied candidate rows (with ordering cols +
          ``_grp``). The reference walk marks a denied row SKIPPED_ROBOTS iff
          it is encountered before the batch fills, i.e. iff its ordering key
          precedes the max_n-th served row's key — the walk emits that key as
          one ``cutoff`` row per group (NULL = walk exhausted its input:
          every denied row is marked), and ``pop`` applies it as a JVM filter
          instead of dragging every denied row through pandas.
        """
        engine, domains = self.engine, self.domains
        # clock parity with the oracle: the FIRST pop runs at t=0 (buckets
        # start full at last_refill=0), the k-th at (k-1)*batch_period
        t_now = (iteration - 1) * self.batch_period
        token_cap = self.token_cap
        mph = max_per_host

        # pushdown-preserving candidate scan (base table + mark-key anti-join
        # — see FrontierEngine._queued_scan)
        cand = self._ordering_cols(engine._queued_scan(iteration), iteration)
        pol = domains.read().select(
            "host", "robots_allow", "delay_s", "budget", "tokens", "last_refill", "fetched"
        )
        joined = cand.join(pol, "host", "left").withColumn(
            "_grp", F.lit(0) if mode == "global" else F.col("partition_id")
        )
        denied = joined.filter(~F.coalesce("robots_allow", F.lit(True))).select(
            "fingerprint", "partition_id", "host", "_ord1", "_ord2", "_grp"
        )
        walkable = joined.filter(F.coalesce("robots_allow", F.lit(True)))

        # bounded pre-prune: two-phase salted per-host top-K (hot-host skew:
        # same shape as FrontierEngine.get_next_requests)
        mph_eff = mph if mph is not None else max_n
        k_nopol = min(max_n, mph_eff)
        k_pol = min(k_nopol, int(token_cap) + 1)
        k_expr = (
            F.when(F.col("robots_allow").isNotNull(), F.lit(k_pol)).otherwise(F.lit(k_nopol))
        )
        salt = F.pmod(F.col("fingerprint"), F.lit(engine.host_salts))
        w1 = Window.partitionBy("host", salt).orderBy("_ord1", "_ord2")
        wh = Window.partitionBy("host").orderBy("_ord1", "_ord2")
        walkable = (
            walkable.withColumn("_rs", F.row_number().over(w1))
            .filter(F.col("_rs") <= k_expr)
            .drop("_rs")
            .withColumn("_rh", F.row_number().over(wh))
            .filter(F.col("_rh") <= k_expr)
            .drop("_rh")
        )
        # narrow Arrow transfer: only what the walk reads
        walk_in = walkable.select(
            "fingerprint", "partition_id", "host", "_ord1", "_ord2", "_grp",
            "robots_allow", "delay_s", "budget", "tokens", "last_refill", "fetched",
        )

        # classic whole-group signature on purpose: the 4.1 iterator form
        # chunks a group into multiple frames, which would reset the bucket
        # state mid-walk
        def schedule(pdf: pd.DataFrame) -> pd.DataFrame:
            grp = int(pdf["_grp"].iloc[0])
            # itertuples mangles underscore-leading names (_ord1 → _1): give
            # the ordering cols walk-local names first
            pdf = pdf.rename(columns={"_ord1": "ord1", "_ord2": "ord2"})
            pdf = pdf.sort_values(["ord1", "ord2"], kind="mergesort")
            allowance: dict[str, float] = {}
            refilled: dict[str, float] = {}
            fetched0: dict[str, int] = {}
            per_host: dict[str, int] = {}
            has_policy: dict[str, bool] = {}
            out = {
                "fingerprint": [], "partition_id": [], "batch_id": [], "state": [],
                "_emit": [], "_has_policy": [], "host": [], "_tokens_after": [],
                "_fetched_after": [], "_last_refill": [],
            }
            n_served = 0
            cut = (None, None)
            for row in pdf.itertuples(index=False):
                if n_served >= max_n:
                    break
                host = row.host
                if host not in allowance:
                    has_pol = row.robots_allow is not None and not pd.isna(row.robots_allow)
                    has_policy[host] = bool(has_pol)
                    if not has_pol:
                        allowance[host] = float("inf")
                    else:
                        toks = float(row.tokens) if not pd.isna(row.tokens) else token_cap
                        last = float(row.last_refill) if not pd.isna(row.last_refill) else 0.0
                        delay = float(row.delay_s) if not pd.isna(row.delay_s) else 0.0
                        if delay > 0:
                            toks = min(token_cap, toks + (t_now - last) / delay)
                        else:
                            toks = token_cap
                        refilled[host] = toks
                        fetched0[host] = int(row.fetched) if not pd.isna(row.fetched) else 0
                        if row.budget is not None and not pd.isna(row.budget):
                            toks = min(toks, float(row.budget) - fetched0[host])
                        allowance[host] = toks
                if mph is not None and per_host.get(host, 0) >= mph:
                    continue  # stays QUEUED (OverusedBuffer carry-over)
                if allowance[host] < 1.0:
                    continue  # throttled: stays QUEUED
                allowance[host] -= 1.0
                per_host[host] = per_host.get(host, 0) + 1
                n_served += 1
                if n_served >= max_n:
                    # the reference walk stops HERE: denied rows ordered
                    # after this key were never encountered
                    cut = (int(row.ord1), int(row.ord2))
                out["fingerprint"].append(row.fingerprint)
                out["partition_id"].append(row.partition_id)
                out["batch_id"].append(iteration)
                out["state"].append(STATE_QUEUED)
                out["_emit"].append("feed")
                out["_has_policy"].append(has_policy[host])
                out["host"].append(host)
                out["_tokens_after"].append(None)
                out["_fetched_after"].append(None)
                out["_last_refill"].append(None)
            # one domain-update row per touched host with a policy
            for host, n in per_host.items():
                if not has_policy.get(host):
                    continue
                out["fingerprint"].append(None)
                out["partition_id"].append(None)
                out["batch_id"].append(None)
                out["state"].append(None)
                out["_emit"].append("domain")
                out["_has_policy"].append(True)
                out["host"].append(host)
                out["_tokens_after"].append(refilled[host] - n)
                out["_fetched_after"].append(fetched0[host] + n)
                out["_last_refill"].append(t_now)
            # the group's robots cutoff (NULL key = mark every denied row)
            out["fingerprint"].append(None)
            out["partition_id"].append(None)
            out["batch_id"].append(None)
            out["state"].append(None)
            out["_emit"].append("cutoff")
            out["_has_policy"].append(False)
            out["host"].append(None)
            out["_tokens_after"].append(None)
            out["_fetched_after"].append(None)
            out["_last_refill"].append(None)
            n = len(out["_emit"])
            cut1 = [None] * (n - 1) + [cut[0]]
            cut2 = [None] * (n - 1) + [cut[1]]
            # int64 columns MUST go through nullable Int64 arrays directly:
            # a mixed int/None list becomes float64 first and silently
            # rounds 64-bit fingerprints (> 2^53) to wrong values
            return pd.DataFrame(
                {
                    "fingerprint": pd.array(out["fingerprint"], dtype="Int64"),
                    "partition_id": pd.array(out["partition_id"], dtype="Int32"),
                    "batch_id": pd.array(out["batch_id"], dtype="Int64"),
                    "state": pd.array(out["state"], dtype="Int32"),
                    "_emit": out["_emit"],
                    "_has_policy": out["_has_policy"],
                    "host": out["host"],
                    "_tokens_after": pd.Series(out["_tokens_after"], dtype="float64"),
                    "_fetched_after": pd.array(out["_fetched_after"], dtype="Int64"),
                    "_last_refill": pd.Series(out["_last_refill"], dtype="float64"),
                    "_grp": pd.array([grp] * n, dtype="Int32"),
                    "_cut1": pd.array(cut1, dtype="Int64"),
                    "_cut2": pd.array(cut2, dtype="Int64"),
                }
            )

        walk = walk_in.groupBy("_grp").applyInPandas(schedule, _SCHED_SCHEMA)
        return walk, denied

    def pop(self, max_n: int, max_per_host: int | None = None, mode: str = "global") -> DataFrame:
        """Strategy-ordered, politeness-gated destructive pop.

        Returns the feed batch (frontier columns) and commits, in ONE frontier
        MERGE: batch_id for served rows + SKIPPED_ROBOTS for robots-denied
        rows encountered during the walk; plus one domain_metadata MERGE for
        the touched hosts' (tokens, last_refill, fetched).
        """
        engine, domains = self.engine, self.domains
        iteration = engine.iteration + 1
        engine.last_pop_pid_counts = None  # invalidate until this pop counts
        walk, denied = self.decide(iteration, max_n, max_per_host, mode)
        decisions = walk.cache()

        # robots skips, JVM-side: denied rows whose ordering key precedes
        # their group's cutoff (no/NULL cutoff = the walk ran out of input,
        # so the reference would have encountered — and marked — every one)
        cutoffs = decisions.filter(F.col("_emit") == "cutoff").select(
            F.col("_grp").alias("_cgrp"), "_cut1", "_cut2"
        )
        robots = (
            denied.join(F.broadcast(cutoffs), denied["_grp"] == F.col("_cgrp"), "left")
            .filter(
                F.col("_cut1").isNull()
                | (F.col("_ord1") < F.col("_cut1"))
                | ((F.col("_ord1") == F.col("_cut1")) & (F.col("_ord2") < F.col("_cut2")))
            )
            .select(
                "fingerprint",
                "partition_id",
                F.lit(None).cast("long").alias("batch_id"),
                F.lit(STATE_SKIPPED_ROBOTS).cast("int").alias("state"),
            )
        )

        # frontier commit: feed marks + robots skips in one MERGE
        marks = (
            decisions.filter(F.col("_emit") == "feed")
            .select("fingerprint", "partition_id", "batch_id", "state")
            .unionByName(robots)
        ).cache()
        # ONE grouped collect covers mark partitions AND domain-write
        # emptiness: domain rows ride along as partition_id=NULL markers, so
        # the write-back below never pays its own isEmpty action per pop
        touched_all = (
            marks.select(
                "partition_id", F.col("batch_id").isNotNull().alias("_served")
            )
            .unionByName(
                decisions.filter(F.col("_emit") == "domain").select(
                    F.lit(None).cast("int").alias("partition_id"),
                    F.lit(None).cast("boolean").alias("_served"),
                )
            )
            .groupBy("partition_id", "_served")
            .count()
            .collect()
        )
        touched = [r for r in touched_all if r["_served"] is not None]
        n_dom = sum(int(r["count"]) for r in touched_all if r["_served"] is None)
        # the feed is exactly the served mark rows — expose its per-partition
        # counts so the loop never re-counts the batch (frontier contract)
        engine.last_pop_pid_counts = {
            r["partition_id"]: int(r["count"]) for r in touched if r["_served"]
        }
        if not touched:
            # nothing servable this tick — still advance the crawl clock so
            # token buckets refill on the next pop (else throttled hosts
            # would deadlock the loop)
            m = engine.table.manifest()
            m["meta"]["iteration"] = iteration
            m["snapshot_id"] += 1
            m["parent_id"] = m["snapshot_id"] - 1
            engine.table._write_manifest(m)
            marks.unpersist()
            decisions.unpersist()
            return engine.table.read().limit(0)
        # robots skips change ``state`` → COW merge (state stays a base
        # column so its parquet pushdown survives); rare relative to serves
        robots_pids = [r["partition_id"] for r in touched if not r["_served"]]
        if robots_pids:
            # narrow UPDATE source — the merge needs only key + state; no
            # reconstruction join against the frontier (frontier._mark shape)
            engine.table.upsert(
                marks.filter(F.col("batch_id").isNull()).select(
                    "fingerprint", "partition_id", "state"
                ),
                set_cols=["state"],
                insert=False,
                affected_pids=robots_pids,
            )
        # served rows only get a batch_id → merge-on-read overlay mark, no
        # partition rewrite (O(batch), same as FrontierEngine's pop). An
        # empty serve set still commits (meta-only) so the crawl clock /
        # token refill keeps ticking
        engine.table.add_marks(
            marks.filter(F.col("batch_id").isNotNull()).select(
                "fingerprint", "partition_id", "batch_id"
            ),
            mark_cols=["batch_id"],
            meta={"iteration": iteration},
            # served counts fall out of the touched collect — small feeds
            # take the driver-side overlay write
            n_rows=sum(engine.last_pop_pid_counts.values()),
        )

        # domain write-back MERGE (the DomainCache batched flush)
        dom = decisions.filter(F.col("_emit") == "domain").select(
            "host",
            F.col("_tokens_after").alias("tokens"),
            F.col("_last_refill").alias("last_refill"),
            F.col("_fetched_after").alias("fetched"),
        )
        if n_dom:  # emptiness came from the touched collect — no extra action
            dom_full = dom.join(
                domains.read().drop("tokens", "last_refill", "fetched"), "host", "inner"
            ).select(*[c.split()[0] for c in DOMAIN_SCHEMA.split(", ")])
            domains.table.upsert(dom_full, set_cols=["tokens", "last_refill", "fetched"])

        feed = (
            decisions.filter(F.col("_emit") == "feed")
            .select("fingerprint", "partition_id")
            .join(engine.table.read(), ["fingerprint", "partition_id"], "inner")
            .select(*FRONTIER_COLS)
            # reconstruct the storage-nulled original url (frontier._finalize)
            .withColumn("url", F.coalesce("url", "canonical_url"))
            # dispatch-time epoch stamp (see FrontierEngine.get_next_requests)
            .withColumn("jid", F.lit(engine.jid).cast("int"))
        ).cache()
        feed.count()  # materialize before dropping the decisions cache
        marks.unpersist()
        decisions.unpersist()
        return feed

    def has_pending(self) -> bool:
        """True if some QUEUED row can eventually be served (host not robots-
        denied, budget not exhausted) — the loop-termination predicate."""
        # iteration=None: a row with a FUTURE crawl_at is still pending —
        # the loop must keep ticking the clock until it comes due
        cand = self.engine._queued_scan(None)
        pol = self.domains.read().select("host", "robots_allow", "budget", "fetched")
        j = cand.join(pol, "host", "left")
        serveable = j.filter(
            F.col("robots_allow").isNull()
            | (
                F.col("robots_allow")
                & (F.col("budget").isNull() | (F.col("budget") - F.col("fetched") >= 1))
            )
        )
        return not serveable.isEmpty()
