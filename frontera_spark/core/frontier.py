"""FrontierEngine — the crawl frontier as declarative DataFrame plans.

Replaces frontera's Backend/Queue/States/Metadata stack (frontera/core/
components.py, contrib/backends/*) with ONE snapshot table:

    frontier(fingerprint, url, canonical_url, host, host_crc32, score,
             bucket, depth, state, seq, jid, batch_id, crawl_at,
             partition_id)

- the **queue** is ``state=QUEUED AND batch_id IS NULL`` rows, popped by a
  strategy-ordered window (frontera: heap pop / SQL ORDER BY+LIMIT+DELETE /
  HBase bucket scan — we mark with batch_id instead of deleting → resumable);
- the **seen set** is the fingerprint key set itself (exact, like frontera's
  States store); dedup is a left_anti join, optionally pre-filtered by bloom
  shards (core/seen.py);
- **partition_id = crc32(host) % P** (Crc32NamePartitioner parity) so one
  host lands in one partition: politeness and per-host caps never need a
  cross-partition view.

Scale notes (100 TB / 10^10 URLs):
- every mutation touches only the partitions its batch hashes to
  (SnapshotTable copy-on-write);
- candidate scans prune on partition_id + push ``state = QUEUED`` to parquet;
- global sequence numbers are allocated per-batch from the manifest counter
  with a single window over the (bounded) batch — the 10^10-row table never
  sees a global sort;
- ``get_next_requests(mode='per_partition')`` ranks inside each partition
  (no global shuffle) — the cluster-scale path; ``mode='global'`` reproduces
  the reference's single-consumer total order for parity tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frontera_spark import (
    STATE_CRAWLED,
    STATE_ERROR,
    STATE_QUEUED,
    STATE_SKIPPED_ROBOTS,
)
from frontera_spark.core.strategies import STRATEGIES, Strategy
from frontera_spark.functions.fingerprint import (
    crc32_signed_col,
    fingerprint64_col,
    partition_id_col,
)
from frontera_spark.functions.urls import host_col, with_canonical_url
from frontera_spark.plans.snapshot import SnapshotTable

FRONTIER_SCHEMA = (
    "fingerprint long, url string, canonical_url string, host string, "
    "host_crc32 int, score double, bucket int, depth int, state int, "
    "seq long, jid int, batch_id long, crawl_at timestamp, partition_id int"
)

FRONTIER_COLS = [c.split()[0] for c in FRONTIER_SCHEMA.split(", ")]


class FrontierEngine:
    # batches at or below this row count take the one-task sort for seq
    # assignment; above it, range-repartitioned rank + driver offsets
    # (see _finalize). Tests shrink this to drive the bulk path.
    BULK_SORT_ROWS = 1 << 18
    # compact a partition once fast-appends stack more than this many leaf
    # dirs on it (or marks more than this many overlay dirs): each append is
    # O(batch), and one rewrite then amortizes over the COMPACT_MAX_DIRS
    # appends that caused it. Tests shrink this to force compaction.
    COMPACT_MAX_DIRS = 8

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        n_partitions: int = 8,
        strategy: str | Strategy = "bfs",
        max_depth: int | None = None,
        max_url_length: int = 2048,
        robots_deny_hosts: frozenset | None = None,
        jid: int = 0,
        use_seen_shards: bool = False,
        shard_capacity: int = 1 << 20,
        host_salts: int = 16,
        canonical_solver: str = "basic",
        middlewares: list | None = None,
    ):
        self.spark = spark
        self.workdir = workdir
        self.n_partitions = n_partitions
        self.strategy = STRATEGIES[strategy] if isinstance(strategy, str) else strategy
        self.max_depth = max_depth
        self.max_url_length = max_url_length
        self.robots_deny_hosts = frozenset(robots_deny_hosts or ())
        self.jid = jid
        self.host_salts = host_salts
        from frontera_spark.functions.canonical import SOLVERS

        self.canonical_solver = SOLVERS[canonical_solver]
        # middleware chain (E2): ordered DataFrame→DataFrame transforms run
        # on every seed/link batch after canonicalization (frontera's
        # add_seeds/links_extracted pass-through chain, core/manager.py
        # pipeline) — the built-in fingerprint/domain projections stay
        # engine-side, exactly like frontera's default middleware stack
        self.middlewares = list(middlewares or [])
        # per-partition row counts of the most recent pop — populated by
        # get_next_requests (and PoliteScheduler.pop) from the grouped
        # collect it already runs, so callers (the crawl loop) never pay a
        # second count/isEmpty job on the feed batch. None = no pop counts
        # pending; pops invalidate at entry and set on every return path, and
        # consumers read through take_pop_counts() which fails loudly on a
        # feed-producing path that forgot to record its counts (the loop's
        # popped−fetched 404 arithmetic depends on THIS pop's counts).
        self.last_pop_pid_counts: dict[int, int] | None = None
        path = os.path.join(workdir, "frontier")
        if os.path.exists(os.path.join(path, "CURRENT")):
            self.table = SnapshotTable.load(spark, path)
        else:
            self.table = SnapshotTable.create(spark, path, FRONTIER_SCHEMA, key=["fingerprint"])
        self.seen = None
        if use_seen_shards:
            from frontera_spark.core.seen import SeenShards

            self.seen = SeenShards(workdir, capacity=shard_capacity)
            if self.seen.stale(self.seen_gen):
                # crash between shard write and manifest sync, or a foreign
                # table mutation: rebuild shards from the committed table
                self.seen.rebuild(self.table.read())
                self.seen.commit(self.seen_gen)

    # ------------------------------------------------------------ properties

    @property
    def next_seq(self) -> int:
        return int(self.table.manifest()["meta"].get("next_seq", 0))

    @property
    def iteration(self) -> int:
        return int(self.table.manifest()["meta"].get("iteration", 0))

    @property
    def seen_gen(self) -> int:
        """Counts seen-set INSERT commits only (marks/clock bumps don't change
        membership) — the freshness key for the bloom/cuckoo shards."""
        return int(self.table.manifest()["meta"].get("seen_gen", 0))

    def count(self, state: int | None = None) -> int:
        """Queue.count() parity (frontera/core/components.py:~130)."""
        df = self.table.read()
        if state is not None:
            df = df.filter(F.col("state") == state)
        return df.count()

    def seen_set(self) -> DataFrame:
        """The exact URL-seen set: (fingerprint, canonical_url, state)."""
        return self.table.read().select("fingerprint", "canonical_url", "state")

    def pending_counts(self) -> dict[int, int]:
        """In-flight backlog per partition: rows marked into a feed batch but
        not yet crawled (the offset-lag analogue — frontera's OffsetsFetcher
        feeds the DBWorker batch generator the consumer lag per spider-feed
        partition, kafkabus.py:~250-330 / worker/db.py:~150-220)."""
        rows = (
            self.table.read()
            .filter((F.col("state") == STATE_QUEUED) & F.col("batch_id").isNotNull())
            .groupBy("partition_id")
            .count()
            .collect()
        )
        return {int(r["partition_id"]): int(r["count"]) for r in rows}

    # ------------------------------------------------------------- scheduling

    def _prepare(self, links: DataFrame) -> DataFrame:
        """url [, depth, _o1, _o2] → full frontier-row candidates.

        Middleware-chain parity (UrlFingerprint/Domain middlewares,
        frontera/contrib/middlewares/fingerprint.py, domain.py) as one
        narrow projection: canonicalize (pandas UDF) → host (JVM) →
        fingerprint/crc32/partition (JVM).
        """
        df = links
        if "redirect_urls" in df.columns:
            # canonical solver (P4/E6): fold the redirect chain into one
            # canonical identity before fingerprinting, so redirect aliases
            # dedup to a single frontier row
            df = df.withColumn(
                "url", self.canonical_solver(F.col("url"), F.col("redirect_urls"))
            ).drop("redirect_urls")
        if "depth" not in df.columns:
            df = df.withColumn("depth", F.lit(0))
        if "_o1" not in df.columns:
            # discovery order = url asc. The url string IS the order key —
            # (_o1,_o2) are only ever compared/range-partitioned, never used
            # arithmetically, so no row_number over a global (single-
            # partition) window is needed
            df = df.withColumn("_o1", F.lit(0)).withColumn("_o2", F.col("url"))
        df = (
            with_canonical_url(df)
            .withColumn("host", host_col(F.col("canonical_url")))
            .filter(F.col("host").isNotNull())
            .filter(F.length("canonical_url") <= self.max_url_length)
        )
        if self.max_depth is not None:
            df = df.filter(F.col("depth") <= self.max_depth)
        if self.strategy.accumulates_cash and "_cash" not in df.columns:
            # OPIC: batches that don't price their links (seed loads, direct
            # links_extracted calls) enter with unit cash per row
            df = df.withColumn("_cash", F.lit(1.0))
        # strategy link predicate (P6, frontera filter_extracted_links):
        # runs after canonicalization so it can see url/canonical_url/host/depth
        df = self.strategy.filter_links(df)
        # user middleware chain (E2); contract: receive and return a
        # DataFrame with at least (url, canonical_url, host, depth, _o1, _o2)
        for mw in self.middlewares:
            df = mw(df)
        df = (
            df.withColumn("fingerprint", fingerprint64_col(F.col("canonical_url")))
            .withColumn("host_crc32", crc32_signed_col(F.col("host")))
            .withColumn("partition_id", partition_id_col(F.col("host"), self.n_partitions))
        )
        # in-batch dedup (keep earliest discovery) happens in _finalize AFTER
        # the seen-set filter: a fingerprint is either wholly seen (all its
        # in-batch rows drop — the wide min_by aggregate never sees them) or
        # wholly fresh (min_by picks the earliest, same result as deduping
        # first). On steady-state re-offers — the dedup-heavy path — this
        # ordering makes the wide-row shuffle run on ~zero rows.
        return df

    def _finalize(
        self,
        candidates: DataFrame,
        extra_updates: DataFrame | None = None,
        update_pids: list[int] | None = None,
    ) -> int:
        """Anti-join seen set, assign seq by discovery order, MERGE QUEUED.

        ``extra_updates`` (narrow (fingerprint, partition_id, state) rows for
        keys ALREADY in the table) ride along in the same MERGE commit: the
        merge sets ``state`` on matched rows and inserts the unmatched fresh
        rows — fresh rows are anti-joined against the table so they never
        match, updates are existing keys so they never insert. One commit
        (one target-partition rewrite) where the unfused
        record_results + links_extracted sequence paid two rewrites of
        largely the same partitions every iteration. ``update_pids`` skips
        the probe job when the caller already knows the updates' partitions.
        """
        upd_cached = False
        if extra_updates is not None and update_pids is None:
            extra_updates = extra_updates.cache()
            upd_cached = True
            update_pids = [
                r["partition_id"]
                for r in extra_updates.select("partition_id").distinct().collect()
            ]
        upd_pids = list(update_pids or [])

        def _upd_done():
            if upd_cached:
                extra_updates.unpersist()
        if self.seen is not None:
            # inline bloom probe (scalar pandas UDF): flags ride along in the
            # cache fill below, computed once, under the batch's existing
            # fingerprint partitioning — no repartition("partition_id")
            # shuffle (P distinct values → ~1/e of P partitions empty → idle
            # cores), no narrow-probe re-join back to the wide rows
            candidates = candidates.withColumn(
                "_maybe",
                self.seen.maybe_seen_udf()(F.col("partition_id"), F.col("fingerprint")),
            )
        candidates = candidates.cache()
        # restrict the seen-set scan to partitions this batch can touch —
        # partition pruning turns the exact anti-join from a full-table
        # shuffle into an affected-partitions one (bloom shards in
        # core/seen.py cut the remainder)
        # per-partition counts (not just distinct pids): the same cache-fill
        # job also tells us the batch size, which gates the seq-assignment
        # strategy below
        pid_rows = candidates.groupBy("partition_id").count().collect()
        pids = [r["partition_id"] for r in pid_rows]
        n_candidates = int(sum(r["count"] for r in pid_rows))
        if not pids:
            candidates.unpersist()
            if extra_updates is not None and upd_pids:
                self._mark(extra_updates, pids=upd_pids)
            _upd_done()
            return 0
        # membership scan: marks never change the key set, so skip the
        # overlay join entirely — base scan, partition-pruned, key column only
        seen_scan = (
            self.table.read(with_marks=False)
            .filter(F.col("partition_id").isin(pids))
            .select("fingerprint")
        )
        if self.seen is not None:
            # bloom pre-filter (probed against shards synced to the PRE-batch
            # seen set — shard files only change in the add() after the
            # merge): blooms have no false negatives, so the ~_maybe rows are
            # definitely new and skip the exact join entirely; only the
            # "maybe" minority anti-joins the seen-set scan. One join total —
            # the previous semi+anti decomposition paid two full-size joins
            # whenever the batch was duplicate-heavy (steady-state re-offers)
            sure_fresh = candidates.filter(~F.col("_maybe")).drop("_maybe")
            checked = (
                candidates.filter(F.col("_maybe"))
                .drop("_maybe")
                .join(seen_scan, "fingerprint", "left_anti")
            )
            fresh = sure_fresh.unionByName(checked)
        else:
            fresh = candidates.join(seen_scan, "fingerprint", "left_anti")

        # OPIC cash ledger (OpicStrategy): cash addressed to ALREADY-KNOWN
        # pages must still accrue — the anti-join above drops those rows, so
        # mirror it with a semi-join (bloom-pruned to the "maybe" minority
        # when shards are on) and fold their cash into narrow per-key score
        # deltas. They ride the same MERGE commit below with add-semantics
        # (t.score + s.score), so a duplicate-heavy steady-state re-offer
        # pays one extra batch-sized join, never a second commit.
        cash_upd = None
        if self.strategy.accumulates_cash and "_cash" in candidates.columns:
            if self.seen is not None:
                known_src = candidates.filter(F.col("_maybe")).drop("_maybe")
            else:
                known_src = candidates
            cash_upd = (
                known_src.join(seen_scan, "fingerprint", "left_semi")
                .groupBy("fingerprint", "partition_id")
                .agg(F.sum("_cash").alias("score"))
            )

        def _combined_updates():
            """One update row per key: state transitions (set-if-not-null)
            and cash accruals (add-if-not-null) folded together so the
            decomposed merge's left join never fans out a target row."""
            upd = cash_upd.withColumn("state", F.lit(None).cast("int"))
            if extra_updates is not None:
                upd = upd.unionByName(
                    extra_updates.select("fingerprint", "partition_id", "state")
                    .withColumn("score", F.lit(None).cast("double"))
                )
            return upd.groupBy("fingerprint", "partition_id").agg(
                F.max("state").alias("state"), F.sum("score").alias("score")
            )

        def _apply_updates_only():
            """Exit-path commit when no inserts survived (all-duplicate
            re-offers): state transitions and any cash accruals still land."""
            if cash_upd is None:
                if extra_updates is not None and upd_pids:
                    self._mark(extra_updates, pids=upd_pids)
                return
            self.table.upsert(
                _combined_updates(),
                set_cols=["state"],
                add_cols=["score"],
                insert=False,
                affected_pids=sorted({*pids, *upd_pids}),
            )

        # in-batch dedup: keep the earliest discovery (order = (_o1,_o2)).
        # Hash-aggregate min_by instead of a per-key window: same semantics
        # (struct comparison is lexicographic) with no sort. Runs AFTER the
        # seen filter (see _prepare) so an all-duplicates re-offer aggregates
        # nothing, and when the anti-join dominated the input the groupBy
        # reuses its fingerprint exchange.
        others = [c for c in fresh.columns if c != "fingerprint"]
        if cash_upd is not None:
            # OPIC: in-batch duplicates keep the earliest discovery row but
            # their cash SUMS (two parents funding the same fresh child)
            agg = fresh.groupBy("fingerprint").agg(
                F.min_by(F.struct(*others), F.struct("_o1", "_o2")).alias("_r"),
                F.sum("_cash").alias("_cs"),
            )
            fresh = agg.select(
                "fingerprint",
                *[F.col(f"_r.{c}").alias(c) for c in others if c != "_cash"],
                F.col("_cs").alias("_cash"),
            )
        else:
            agg = fresh.groupBy("fingerprint").agg(
                F.min_by(F.struct(*others), F.struct("_o1", "_o2")).alias("_r")
            )
            fresh = agg.select(
                "fingerprint", *[F.col(f"_r.{c}").alias(c) for c in others]
            )

        state = (
            F.when(F.col("host").isin(list(self.robots_deny_hosts)), F.lit(STATE_SKIPPED_ROBOTS))
            if self.robots_deny_hosts
            else F.lit(None).cast("int")
        )
        next_seq = self.next_seq
        fresh = fresh.withColumn(
            "state",
            F.coalesce(state, F.lit(STATE_QUEUED)) if self.robots_deny_hosts else F.lit(STATE_QUEUED),
        )
        # storage-boundary url compression: the steady-state crawl's links are
        # overwhelmingly already-canonical, so storing the original url only
        # when it DIFFERS from canonical_url (else NULL — parquet RLE makes a
        # null column ~free) cuts the widest column out of the 10^10-row
        # table; read paths that surface the feed reconstruct it with
        # coalesce(url, canonical_url)
        fresh = fresh.withColumn(
            "url",
            F.when(F.col("url") == F.col("canonical_url"), F.lit(None).cast("string"))
            .otherwise(F.col("url")),
        )
        # materialize the anti-join once. No isEmpty() probe here: the
        # qcounts collect below doubles as the emptiness check (n_queued==0
        # exit), so the all-duplicates re-offer pays one action, and every
        # non-empty call saves one — on the small-batch path `ranged` is a
        # coalesce(1) of this cache, so qcounts is as cheap as the probe was
        fresh = fresh_cache = fresh.cache()
        # seq allocation = exact global discovery order (_o1,_o2) WITHOUT a
        # single-partition sort: range-repartition on the order key (range
        # partitions are assigned in sorted order → global order = (partition,
        # in-partition rank)), rank inside each partition, then add driver-side
        # cumulative offsets (one tiny P-row collect). Robots-skipped rows are
        # recorded in the seen set but get no queue seq (parity: oracle assigns
        # seq only to QUEUED rows).
        # small batches (the steady-state crawl loop schedules a few thousand
        # links per iteration) skip repartitionByRange — its sampling pass is
        # a whole extra job, and a one-task sort of <=256k rows is cheaper
        # than 32 tiny range partitions. Large batches (bulk seed loads) keep
        # the range path: global order without a single-partition sort.
        small = n_candidates <= self.BULK_SORT_ROWS
        if not small:
            # bulk batches: materialize the anti-join once and branch on the
            # FRESH count, not the candidate count — a duplicate-heavy bulk
            # re-offer (steady-state recrawl offers, the dedup bench stage)
            # exits right here without paying repartitionByRange's sampling
            # pass over the join, and a bulk load whose survivors fit the
            # one-task sort skips the range machinery too. Small batches
            # keep their single-action path (qcounts doubles as the probe).
            n_fresh = fresh_cache.count()
            if n_fresh == 0:
                # nothing survived the seen filter (robots rows would be in
                # fresh, so there are none either): nothing to insert
                fresh_cache.unpersist()
                _apply_updates_only()
                candidates.unpersist()
                _upd_done()
                return 0
            small = n_fresh <= self.BULK_SORT_ROWS
        if small:
            ranged = fresh.coalesce(1).withColumn("_spid", F.spark_partition_id()).cache()
        else:
            ranged = (
                fresh.repartitionByRange(self.n_partitions, "_o1", "_o2")
                .withColumn("_spid", F.spark_partition_id())
                .cache()
            )
        qcounts = {
            r["_spid"]: r["cnt"]
            for r in ranged.filter(F.col("state") == STATE_QUEUED)
            .groupBy("_spid")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        acc = next_seq
        offsets = {}
        for spid in sorted(qcounts):
            offsets[spid] = acc
            acc += qcounts[spid]
        off_expr = F.lit(next_seq)
        if offsets:
            off_expr = F.create_map(
                *[F.lit(x) for spid, off in offsets.items() for x in (spid, off)]
            )[F.col("_spid")]
        wq = Window.partitionBy("_spid").orderBy("_o1", "_o2")
        queued = (
            ranged.filter(F.col("state") == STATE_QUEUED)
            .withColumn("seq", F.row_number().over(wq) - 1 + off_expr)
        )
        others = ranged.filter(F.col("state") != STATE_QUEUED).withColumn(
            "seq", F.lit(None).cast("long")
        )
        fresh = queued.unionByName(others)
        rows = (
            fresh.withColumn("score", self.strategy.score())
            .withColumn("bucket", F.floor(F.col("score") * 100).cast("int"))
            .withColumn("jid", F.lit(self.jid))
            .withColumn("batch_id", F.lit(None).cast("long"))
            .withColumn("crawl_at", F.lit(None).cast("timestamp"))
            .select(*FRONTIER_COLS)
        )
        # n_queued falls out of the offsets collect — no extra count job
        n_queued = acc - next_seq
        if n_queued == 0 and not self.robots_deny_hosts:
            # everything deduped out: nothing to insert — but ride-along
            # state updates still need their (mark-shaped) commit
            ranged.unpersist()
            fresh_cache.unpersist()
            _apply_updates_only()
            candidates.unpersist()
            _upd_done()
            return 0
        gen = self.seen_gen + 1
        meta = {"next_seq": next_seq + n_queued, "seen_gen": gen}
        if extra_updates is not None or cash_upd is not None:
            # narrow update rows padded with nulls: the merge's matched
            # branch reads only key + set/add cols from the source, and only
            # update rows can match (fresh rows are post-anti-join). The
            # _upd_only flag fences the insert branch: an update whose key is
            # NOT in the table (foreign/malformed bus message, replay across
            # a table reset) drops instead of inserting a null-padded row —
            # same no-op semantics as record_results/_mark (insert=False).
            # ``pids`` (all candidate partitions) over-approximates the
            # touched set — safe: upsert rewrites-and-relinks either way.
            if cash_upd is not None:
                upd = _combined_updates()
                add = ["score"]
            else:
                upd = extra_updates.select("fingerprint", "partition_id", "state")
                add = None
            rows = rows.withColumn("_upd_only", F.lit(False)).unionByName(
                upd.withColumn("_upd_only", F.lit(True)),
                allowMissingColumns=True,
            )
            self.table.upsert(
                rows,
                set_cols=["state"],
                add_cols=add,
                meta=meta,
                affected_pids=sorted({*pids, *upd_pids}),
                no_insert_col="_upd_only",
            )
        else:
            # pure-insert commit (seed loads, link scheduling with no state
            # updates riding along): every row is post-anti-join fresh, so
            # this is a FAST APPEND — new leaf dirs extend the touched
            # partitions' manifests, the 10^10-row table is never read or
            # rewritten. O(batch) regardless of table size, where the COW
            # merge was O(affected partitions). compact_if_needed() (called
            # by the crawl loop) folds accumulated append dirs back down.
            self.table.append(rows, meta=meta)
        if self.seen is not None:
            # shard update AFTER the merge, manifest sync last: a crash in
            # between leaves the manifest stale → rebuild at next load, so
            # shards are always a superset of the committed seen set
            self.seen.add(candidates.select("partition_id", "fingerprint"))
            self.seen.commit(gen)
        ranged.unpersist()
        fresh_cache.unpersist()
        candidates.unpersist()
        _upd_done()
        return n_queued

    def add_seeds(self, seeds: DataFrame) -> int:
        """S1 seed loader (frontera/utils/add_seeds.py): df(url [, seq])."""
        if "seq" in seeds.columns:
            df = seeds.withColumn("_o1", F.lit(0)).withColumn("_o2", F.col("seq")).drop("seq")
        else:
            df = seeds
        return self._finalize(self._prepare(df))

    def add_seeds_sitemaps(self, sitemaps: DataFrame, xml_col: str = "sitemap_xml") -> int:
        """S1 seed loader, sitemap edition: df(sitemap_xml [, ...]) → extract
        every ``<loc>`` URL (functions/sitemaps.py — regexp + explode, pure
        codegen, no XML lib) and schedule the set through the normal seed
        path (canonicalize → fingerprint → seen anti-join → MERGE). Sitemap
        INDEX files (<sitemap><loc> entries pointing at more sitemaps) are
        the same projection one level up — feed the extracted URLs back
        through the crawl loop like any other link-following step."""
        from frontera_spark.functions.sitemaps import extract_locs

        return self.add_seeds(extract_locs(sitemaps, xml_col).select("url"))

    def add_seeds_sitemap_index(
        self,
        indexes: DataFrame,
        documents: DataFrame,
        xml_col: str = "sitemap_xml",
        url_col: str = "url",
    ) -> int:
        """S1 seed loader, sitemap-INDEX edition: resolve one level of
        sitemaps.org index files (``<sitemap><loc>`` entries pointing at
        child sitemaps) against a fetched sitemap-document table
        ``documents(url_col, xml_col)``, then schedule every child's
        ``<loc>`` URL set through the normal seed path. Children the
        document table doesn't hold are skipped (their fetch failed);
        deeper nesting is the same call again on the resolved frame.

        Discovery order is deterministic: (child position in the index,
        loc position within the child) — so seqs are reproducible like
        every other seed path (resolution + scale notes:
        ``functions.sitemaps.resolve_index``).
        """
        from frontera_spark.functions.sitemaps import resolve_index

        seeds = resolve_index(indexes, documents, xml_col=xml_col, url_col=url_col)
        return self._finalize(self._prepare(seeds))

    def add_seeds_robots(
        self,
        robots_by_host: dict[str, str],
        documents: DataFrame,
        xml_col: str = "sitemap_xml",
        url_col: str = "url",
    ) -> int:
        """S1 seed loader, robots edition: bootstrap the frontier from the
        ``Sitemap:`` directives robots.txt files advertise (the sitemaps.org
        robots.txt protocol — how real crawls discover a host's sitemaps
        without guessing paths). ``robots_by_host`` holds fetched robots.txt
        bodies; ``documents(url_col, xml_col)`` holds fetched sitemap
        documents. The advertised URL set is hosts-sized — broadcast it onto
        the document table; advertised sitemaps with no document row are
        skipped (their fetch failed), and every resolved ``<loc>`` URL runs
        the normal seed path (canonicalize → fingerprint → seen anti-join →
        MERGE). Index files advertised here resolve via
        ``add_seeds_sitemap_index`` on the same document table."""
        from frontera_spark.core.robots import parse_sitemap_urls

        advertised = [
            u for text in robots_by_host.values() for u in parse_sitemap_urls(text)
        ]
        if not advertised:
            return 0
        adv = self.spark.createDataFrame(
            [(u,) for u in dict.fromkeys(advertised)], f"{url_col} string"
        )
        # keep only the XML body: extract_locs emits its own `url` column,
        # which would collide with the sitemap document's address column
        return self.add_seeds_sitemaps(
            documents.join(F.broadcast(adv), url_col).select(xml_col), xml_col
        )

    def add_seeds_file(self, path: str) -> int:
        """Bulk seed load; line order = discovery order. The order key is
        ``monotonically_increasing_id()`` used AS a key (split index in the
        high bits, offset in the low bits = file order for a text scan) —
        not fed through a global window, which would single-partition a
        10^10-line seed file. Dense seqs are assigned range-partitioned in
        ``_finalize``."""
        lines = self.spark.read.text(path)
        seeds = (
            lines.withColumn("seq", F.monotonically_increasing_id())
            .select(F.trim("value").alias("url"), "seq")
            .filter(F.col("url") != "")
        )
        return self.add_seeds(seeds)

    def links_extracted(self, links: DataFrame) -> int:
        """df(url, parent_seq, link_pos, depth): schedule NOT_CRAWLED links.

        Discovery order = (parent_seq, link_pos) — exactly the order the
        single-consumer reference ingests links (tests/backends.py model).
        """
        df = links.withColumn("_o1", F.col("parent_seq")).withColumn("_o2", F.col("link_pos"))
        sel = ["url", "depth", "_o1", "_o2"] + (["_cash"] if "_cash" in df.columns else [])
        return self._finalize(self._prepare(df.select(*sel)))

    def _queued_scan(self, iteration: int | None) -> DataFrame:
        """Poppable candidates with parquet pushdown INTACT under live marks.

        Filtering ``batch_id IS NULL`` above the merge-on-read overlay join
        blocks every pushdown (the overlay wraps batch_id in a join-dependent
        CASE). But the engine's marks only ever SET batch_id (pops stamp the
        iteration; nothing writes a NULL mark), so:

            post-overlay batch_id IS NULL
              ⟺ base batch_id IS NULL AND key has no live mark.

        Scan the BASE table — state/batch_id/crawl_at all reach the parquet
        readers as PushedFilters — and broadcast-anti-join the bounded
        live-mark key set. With no live marks this is exactly the base scan.
        """
        cand = self.table.read(with_marks=False).filter(
            (F.col("state") == STATE_QUEUED) & F.col("batch_id").isNull()
        )
        if iteration is not None:
            # revisit clock gate; ``None`` keeps not-yet-due rows (callers
            # asking "could anything EVER be served", e.g. has_pending)
            now = F.timestamp_seconds(F.lit(iteration))
            cand = cand.filter(F.col("crawl_at").isNull() | (F.col("crawl_at") <= now))
        mk = self.table.read_mark_keys()
        if mk is not None:
            cand = cand.join(F.broadcast(mk), ["fingerprint", "partition_id"], "left_anti")
        return cand

    def detect_trap_hosts(self, fanout_threshold: float = 50.0) -> dict[str, float]:
        """Hosts whose QUEUED frontier looks like a crawler trap (core/traps.py
        template fan-out: distinct URLs per digit-folded, query-stripped URL
        template). A calendar/session-id trap floods one template with
        unbounded URLs; a benign host's queue spreads over many templates.

        One hash aggregation over the queued scan (state pushdown intact);
        returns a driver dict {host: fanout} for hosts ≥ the threshold —
        bounded by the host count, the same cardinality class as the
        politeness DomainMetadata. Feed it to ``get_next_requests(host_caps=
        {host: small_cap})`` to budget-cap suspects instead of banning them
        (IRLbot-style budget enforcement: a capped trap still drains slowly,
        a false positive is throttled, not lost)."""
        from frontera_spark.core.traps import url_template

        url = F.coalesce("url", "canonical_url")
        stats = (
            self._queued_scan(None)
            .groupBy("host")
            .agg(
                F.count(F.lit(1)).alias("n_urls"),
                F.countDistinct(url_template(url)).alias("n_templates"),
            )
            .filter(
                F.col("n_urls").cast("double") / F.col("n_templates")
                >= F.lit(fanout_threshold)
            )
            .select("host", (F.col("n_urls").cast("double") / F.col("n_templates")).alias("fanout"))
        )
        return {r["host"]: float(r["fanout"]) for r in stats.collect()}

    # ---------------------------------------------------------------- popping

    def get_next_requests(
        self,
        max_n: int,
        max_per_host: int | None = None,
        mode: str = "global",
        mark: bool = True,
        min_requests: int | None = None,
        min_hosts: int | None = None,
        max_pending: int | None = None,
        host_caps: dict[str, int] | None = None,
    ) -> DataFrame:
        """Destructive top-k pop (T1): returns the feed batch and marks rows.

        mode='global': reference-parity total order (single window — use for
        sequence tests and small frontiers).
        mode='per_partition': each partition yields its strategy-ordered top
        ``max_n`` (the cluster-scale path; no global shuffle, matches
        frontera's per-partition get_next_requests contract where partition
        consumers are independent).

        ``min_requests`` / ``min_hosts`` reproduce frontera's batch-shaping
        floors (HBaseQueue.get_next_requests(min_requests=, min_hosts=,
        max_requests_per_host=), settings BC_MIN_REQUESTS / BC_MIN_HOSTS,
        frontera/contrib/backends/hbase/__init__.py:~150-240): the scan stops
        at the EARLIEST point where it has taken ≥ min_requests rows covering
        ≥ min_hosts distinct hosts (so one hot host can't fill the whole
        batch), still hard-capped at ``max_n``; if the floors are unreachable
        the whole (capped) queue is returned. Both stop conditions are
        monotone in the take position, so the cutoff is a window expression
        over the already-bounded top-``max_n`` prefix — no extra pass over
        the frontier. Floors apply per consumer group (globally in 'global'
        mode, per partition in 'per_partition' mode, matching the
        per-partition DBWorker batch generator).

        ``max_pending`` is the backpressure gate (X4/A5, frontera's
        offset-lag flow control): partitions whose in-flight backlog
        (marked-but-uncrawled rows) has reached the threshold produce no new
        feed rows this pop — the DBWorker only generates batches for
        partitions whose consumers caught up.
        """
        iteration = self.iteration + 1
        self.last_pop_pid_counts = None  # invalidate until this pop counts
        # revisiting (frontera/contrib/backends/sqlalchemy/revisiting.py):
        # re-queued rows carry crawl_at; they re-enter the feed only once the
        # deterministic crawl clock (1 iteration = 1 tick) reaches it.
        # _queued_scan keeps the state/batch_id/crawl_at pushdown alive even
        # with live pop marks (base scan + mark-key anti-join).
        cand = self._queued_scan(iteration).withColumn(
            # reconstruct the storage-nulled original url (see _finalize)
            "url", F.coalesce("url", "canonical_url")
        )
        if max_pending is not None:
            lag = self.pending_counts()  # one P-row metadata-cheap collect
            over = [pid for pid, n in lag.items() if n >= max_pending]
            if over:
                cand = cand.filter(~F.col("partition_id").isin(over))
        order = self.strategy.ordering(iteration)
        if max_per_host is not None or host_caps:
            # effective per-host cap: min(max_per_host, host_caps[host]) —
            # ``host_caps`` is the trap-guard override (detect_trap_hosts),
            # a bounded driver-side map broadcast as a literal expression;
            # hosts in neither stay uncapped (NULL cap passes the filter).
            # least() skips NULLs, so each side is optional independently.
            caps = []
            if host_caps:
                cap_map = F.create_map(
                    *[F.lit(x) for kv in sorted(host_caps.items()) for x in kv]
                )
                caps.append(cap_map[F.col("host")])
            if max_per_host is not None:
                caps.append(F.lit(max_per_host))
            eff = F.least(*caps) if len(caps) > 1 else caps[0]
            # hot-host skew (SURVEY.md Q7): a single per-host window would
            # funnel a hot host's whole queue through one task. Two-phase
            # salted top-k instead: rank within (host, salt) first — the
            # global per-host top-k is a subset of the union of per-salt
            # top-k's — so the final per-host window sees at most
            # host_salts × cap rows per host, whatever the skew. The cap
            # expression is constant within a host, so the per-row compare
            # against the window rank is exact.
            salt = F.pmod(F.col("fingerprint"), F.lit(self.host_salts))
            w1 = Window.partitionBy("host", salt).orderBy(*order)
            cand = (
                cand.withColumn("_rs", F.row_number().over(w1))
                .filter(eff.isNull() | (F.col("_rs") <= eff))
                .drop("_rs")
            )
            wh = Window.partitionBy("host").orderBy(*order)
            cand = (
                cand.withColumn("_rh", F.row_number().over(wh))
                .filter(eff.isNull() | (F.col("_rh") <= eff))
                .drop("_rh")
            )
        if mode == "global":
            grp = F.lit(0)
            wg = Window.orderBy(*order)
        else:
            grp = F.col("partition_id")
            wg = Window.partitionBy("partition_id").orderBy(*order)
        batch = cand.withColumn("_rn", F.row_number().over(wg)).filter(F.col("_rn") <= max_n)
        if min_requests is not None or min_hosts is not None:
            min_req = min_requests or 0
            min_h = min_hosts or 0
            batch = batch.withColumn("_bgrp", grp)
            # cumulative distinct-host count along the take order (bounded:
            # the window runs over ≤ max_n rows per group)
            w_first = Window.partitionBy("_bgrp", "host").orderBy("_rn")
            w_cum = Window.partitionBy("_bgrp").orderBy("_rn")
            w_grp = Window.partitionBy("_bgrp")
            batch = (
                batch.withColumn(
                    "_nh", (F.row_number().over(w_first) == 1).cast("int")
                )
                .withColumn("_ch", F.sum("_nh").over(w_cum))
                .withColumn(
                    "_cut",
                    F.min(
                        F.when(
                            (F.col("_rn") >= min_req) & (F.col("_ch") >= min_h), F.col("_rn")
                        )
                    ).over(w_grp),
                )
                .filter(F.col("_rn") <= F.coalesce("_cut", F.lit(max_n)))
                .drop("_bgrp", "_nh", "_ch", "_cut")
            )
        batch = batch.drop("_rn")
        # the feed is stamped with the CURRENT engine jid, not the row's
        # enqueue-time jid: fencing (X7) must drop results from requests
        # *dispatched* under an older epoch — frontera fences on the jid the
        # request was generated under (worker/strategy.py), and stamping at
        # enqueue time would permanently fence every pre-rollover frontier row
        marked = (
            batch.select(*FRONTIER_COLS)
            .withColumn("batch_id", F.lit(iteration))
            .withColumn("jid", F.lit(self.jid).cast("int"))
        )
        # cache the batch: it is both the mark-merge source and the feed;
        # one grouped collect yields emptiness check + touched partitions
        marked = marked.cache()
        pid_counts = marked.groupBy("partition_id").count().collect()
        self.last_pop_pid_counts = {
            r["partition_id"]: int(r["count"]) for r in pid_counts
        }
        if not pid_counts:
            # empty pop still advances the crawl clock: revisit timers
            # (crawl_at ticks) must keep counting toward their due time
            m = self.table.manifest()
            m["meta"]["iteration"] = iteration
            m["snapshot_id"] += 1
            m["parent_id"] = m["snapshot_id"] - 1
            self.table._write_manifest(m)
            marked.unpersist()
            return marked.limit(0)
        if mark:
            # ``mark=False`` skips this merge for fused loops that commit
            # CRAWLED for the whole batch before the next pop anyway.
            # Merge-on-read: the batch_id mark is an overlay delta, NOT a
            # partition rewrite — a pop touches every partition (per-
            # partition top-k), so a COW mark would rewrite the whole
            # 10^10-row frontier per iteration; the delta is O(batch) and
            # gets absorbed by the next state-transition COW merge
            self.table.add_marks(
                marked.select("fingerprint", "partition_id", "batch_id"),
                mark_cols=["batch_id"],
                meta={"iteration": iteration},
                # the grouped collect above already counted the batch — small
                # pops take add_marks' driver-side pyarrow write (no shuffle,
                # no distributed-write commit protocol)
                n_rows=sum(self.last_pop_pid_counts.values()),
            )
        else:
            m = self.table.manifest()
            m["meta"]["iteration"] = iteration
            m["snapshot_id"] += 1
            m["parent_id"] = m["snapshot_id"] - 1
            self.table._write_manifest(m)
        return marked

    def compact_if_needed(self) -> bool:
        """Fold append-accumulated leaf dirs (and over-long mark overlays)
        when any partition crosses COMPACT_MAX_DIRS. The check reads only the
        manifest (zero Spark jobs); steady-state iterations where nothing
        crossed the bound pay nothing. Returns True when a compaction ran."""
        s = self.table.maintenance_stats()
        if (
            s["max_dirs"] <= self.COMPACT_MAX_DIRS
            and s["max_mark_dirs"] <= self.COMPACT_MAX_DIRS
        ):
            return False
        self.table.compact(
            max_dirs=self.COMPACT_MAX_DIRS, max_mark_dirs=self.COMPACT_MAX_DIRS
        )
        return True

    def take_pop_counts(self) -> dict[int, int]:
        """Consume the per-partition row counts of the pop that just ran
        (one-shot). Raises if no pop recorded counts since the last take —
        a feed-producing path that skipped the bookkeeping would otherwise
        silently corrupt the crawl loop's popped−fetched error arithmetic."""
        counts = self.last_pop_pid_counts
        if counts is None:
            raise RuntimeError(
                "no pop counts pending: the feed-producing path did not "
                "record last_pop_pid_counts for this batch"
            )
        self.last_pop_pid_counts = None
        return counts

    # ------------------------------------------------------------- results in

    def _fence(self, results: DataFrame) -> DataFrame:
        """Job-epoch fencing (frontera's new_job_id / meta[b'jid'] check,
        worker/strategy.py): results minted under an older jid — in-flight
        work from a previous job epoch — are dropped, not applied."""
        if "jid" in results.columns:
            return results.filter(F.col("jid") == self.jid)
        return results

    def page_crawled(self, results: DataFrame) -> None:
        """df(fingerprint, partition_id [, jid]): mark CRAWLED
        (States.set_states)."""
        src = self._fence(results).select("fingerprint", "partition_id").withColumn(
            "state", F.lit(STATE_CRAWLED)
        )
        self._mark(src)

    def request_error(self, results: DataFrame) -> None:
        src = self._fence(results).select("fingerprint", "partition_id").withColumn(
            "state", F.lit(STATE_ERROR)
        )
        self._mark(src)

    def record_results(self, crawled: DataFrame, errored: DataFrame | None) -> None:
        """page_crawled + request_error fused into ONE state-transition
        MERGE: both outcomes land on the same batch's partitions, so two
        separate upserts would commit (and rewrite) those partitions twice
        per iteration. frontera's API keeps the calls separate
        (States.set_states per message type); the micro-batch loop sees both
        frames at once and uses this."""
        src = self._fence(crawled).select("fingerprint", "partition_id").withColumn(
            "state", F.lit(STATE_CRAWLED)
        )
        if errored is not None:
            src = src.unionByName(
                self._fence(errored)
                .select("fingerprint", "partition_id")
                .withColumn("state", F.lit(STATE_ERROR))
            )
        self._mark(src)

    def ingest_results(
        self,
        crawled: DataFrame,
        errored: DataFrame | None,
        links: DataFrame,
        update_pids: list[int] | None = None,
    ) -> int:
        """The whole spider-log ingestion — CRAWLED/ERROR state transitions
        AND the extracted links' QUEUED inserts — in ONE MERGE commit.

        record_results + links_extracted each rewrite the (largely
        overlapping) touched partitions; at one call each per iteration that
        is two COW rewrites of the same files. Fusing them halves the
        per-iteration commit cost and shrinks the crash window to a single
        atomic snapshot: either the iteration's results AND links are all
        in, or the pop marks are still live and ``_recover`` replays the
        batch (fetching is deterministic, so replay is idempotent).

        Returns the number of newly queued links (links_extracted's value).
        """
        upd = self._fence(crawled).select("fingerprint", "partition_id").withColumn(
            "state", F.lit(STATE_CRAWLED)
        )
        if errored is not None:
            upd = upd.unionByName(
                self._fence(errored)
                .select("fingerprint", "partition_id")
                .withColumn("state", F.lit(STATE_ERROR))
            )
        df = links.withColumn("_o1", F.col("parent_seq")).withColumn(
            "_o2", F.col("link_pos")
        )
        sel = ["url", "depth", "_o1", "_o2"] + (["_cash"] if "_cash" in df.columns else [])
        return self._finalize(
            self._prepare(df.select(*sel)),
            extra_updates=upd,
            update_pids=update_pids,
        )

    def revisit(self, condition, after_iterations: int = 1) -> int:
        """Re-queue CRAWLED rows matching ``condition`` for recrawl at
        ``crawl_at = now + after_iterations`` ticks (X6, the revisiting
        backend's REVISIT_INTERVAL timer on the deterministic clock). The
        rows stay in the seen set — dedup of re-discovered links is
        unaffected — but become poppable again once due."""
        due = F.timestamp_seconds(F.lit(self.iteration + after_iterations))
        src = (
            self.table.read()
            .filter((F.col("state") == STATE_CRAWLED) & condition)
            .withColumn("state", F.lit(STATE_QUEUED))
            .withColumn("batch_id", F.lit(None).cast("long"))
            .withColumn("crawl_at", due)
            .select(*FRONTIER_COLS)
        ).cache()
        pid_counts = src.groupBy("partition_id").count().collect()
        if not pid_counts:
            src.unpersist()
            return 0
        self.table.upsert(
            src,
            set_cols=["state", "batch_id", "crawl_at"],
            insert=False,
            affected_pids=[r["partition_id"] for r in pid_counts],
        )
        n = int(sum(r["count"] for r in pid_counts))
        src.unpersist()
        return n

    def revisit_adaptive(self, observations: DataFrame, ts_col: str = "ts") -> int:
        """X6, adaptive edition: re-queue each CRAWLED page at its
        Cho–Garcia-Molina estimated next change time instead of a fixed
        interval (``revisit``'s REVISIT_INTERVAL semantics; frontera analog
        frontera/contrib/backends/sqlalchemy/revisiting.py:~1-100).

        ``observations`` — one row per OBSERVED content change:
        (fingerprint long, partition_id int, ``ts_col`` timestamp), with
        timestamps on the engine's deterministic crawl clock
        (``timestamp_seconds(iteration)``; the crawl loop's change log is
        exactly this shape). Pages with ≥ 2 observed changes get
        ``crawl_at = next_due_us`` from ``core.revisit.change_rate_schedule``
        — one mean change interval after their last observed change — so
        fast-moving pages re-enter the frontier often and static pages never
        do. Only currently-CRAWLED rows are touched (QUEUED rows keep the
        estimate they were re-queued under; a due-but-unpopped page is not
        rescheduled out from under the pop).

        Scale shape: one hash agg over the change log (the estimator), a
        partition-pruned semi-join against the frontier's CRAWLED keys, and
        a narrow per-key MERGE — O(observed changers), never O(table).
        """
        from frontera_spark.core.revisit import change_rate_schedule

        sched = change_rate_schedule(observations, page_col="fingerprint", ts_col=ts_col)
        keys = observations.select("fingerprint", "partition_id").distinct()
        return self.requeue_due(
            sched.join(keys, "fingerprint").select(
                "fingerprint",
                "partition_id",
                F.timestamp_micros(F.col("next_due_us")).alias("crawl_at"),
            )
        )

    def requeue_due(self, due: DataFrame, from_state: str | None = None) -> int:
        """Re-queue rows currently in ``from_state`` (default CRAWLED) at
        PER-ROW due times: df(fingerprint, partition_id, crawl_at). The
        generic primitive under every re-scheduling policy —
        ``revisit_adaptive`` feeds it the estimator's schedule, the crawl
        loop's backoff path feeds it doubled intervals for unchanged pages,
        and the retry policy (core/retry.py) feeds it error-backoff dues
        with ``from_state=STATE_ERROR``. Rows whose page is not currently in
        ``from_state`` are dropped (QUEUED pages keep the due time they were
        re-queued under). O(due set): partition-pruned semi-join + narrow
        MERGE, never O(table)."""
        if from_state is None:
            from_state = STATE_CRAWLED
        src = (
            due.select(
                "fingerprint",
                "partition_id",
                F.lit(STATE_QUEUED).alias("state"),
                F.lit(None).cast("long").alias("batch_id"),
                F.col("crawl_at"),
            )
            .cache()
        )
        pids = [r["partition_id"] for r in src.select("partition_id").distinct().collect()]
        if not pids:
            src.unpersist()
            return 0
        eligible = (
            self.table.read(with_marks=False)
            .filter((F.col("state") == from_state) & F.col("partition_id").isin(pids))
            .select("fingerprint")
        )
        due = src.join(eligible, "fingerprint", "left_semi").cache()
        pid_counts = due.groupBy("partition_id").count().collect()
        src.unpersist()
        if not pid_counts:
            due.unpersist()
            return 0
        self.table.upsert(
            due,
            set_cols=["state", "batch_id", "crawl_at"],
            insert=False,
            affected_pids=[r["partition_id"] for r in pid_counts],
        )
        n = int(sum(r["count"] for r in pid_counts))
        due.unpersist()
        return n

    def _mark(self, src: DataFrame, pids: list[int] | None = None) -> None:
        """Narrow state-transition MERGE: (fingerprint, partition_id, state)
        is all the merge needs — SnapshotTable accepts update-only sources,
        so there is no reconstruction join against the full frontier, and
        the target scan inside the merge prunes to the batch's partitions.
        At 10^10 rows this is the difference between O(batch) and O(table)
        per page_crawled/request_error call."""
        self.table.upsert(
            src.select("fingerprint", "partition_id", "state"),
            set_cols=["state"],
            insert=False,
            affected_pids=pids,
        )
