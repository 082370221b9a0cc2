"""The crawl loop: one deterministic micro-batch per iteration (SURVEY.md §3.4).

Collapses frontera's distributed spider ↔ strategy-worker ↔ DB-worker message
cycle (frontera/worker/strategy.py, worker/db.py, core/manager.py — spider
log / scoring log / spider feed hops) into one DataFrame pipeline per
iteration:

    feed_i    = engine.get_next_requests(...)          # batch generator
    results_i = fetch(feed_i ⋈ corpus)                 # downloader simulator
                + decode image, PSNR/caption invariant #   (mapInPandas)
    links_i   = explode(results_i.out_links)           # link extraction
    engine.ingest_results(ok, missing, links_i)        # spider log + scoring
                                                       #   log fused: ONE MERGE
    metrics_i → workdir/metrics/iter=<i>/              # per-partition lineage

Every stage is a DataFrame op; the only Python-side loop is over iterations
(the micro-batch trigger). The fetch simulator replaces Scrapy's downloader
(frontera/contrib/scrapy/schedulers/frontier.py) with an equi-join against the
deterministic image+caption corpus — the per-row payload invariant
(decoded-pixel PSNR vs the pre-quantization reference, caption equality) is
checked in the same Arrow batch that "downloads" the page.

Resume: all mutable state lives in the frontier snapshot table; a killed run
restarts with ``CrawlLoop(...).run()`` — ``_recover()`` re-queues rows that
were marked into a feed batch but never crawled (idempotent: fetching is a
pure function of the corpus), and metrics for an iteration are overwritten,
not appended, so a replayed iteration leaves one copy.
"""

from __future__ import annotations

import argparse
import os
import shutil
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frontera_spark import STATE_QUEUED
from frontera_spark.core.frontier import FrontierEngine

FETCH_RESULT_SCHEMA = (
    "fingerprint long, canonical_url string, host string, partition_id int, "
    "seq long, depth int, jid int, image_id string, caption string, phash long, "
    "n_bytes int, psnr double, invariant_ok boolean, caption_ok boolean, "
    "out_links array<string>"
)

METRICS_SCHEMA = (
    "iteration int, partition_id int, n_fetched long, n_links long, "
    "n_scheduled long, n_errors long, bytes_fetched long, psnr_min double, "
    "invariant_violations long, t_sec double"
)


FEED_COLS = ["fingerprint", "canonical_url", "host", "partition_id", "seq", "depth", "jid"]


def fetch_stage(
    feed: DataFrame,
    corpus: DataFrame,
    corpus_seed: int,
    check_invariant: bool = True,
    server_ignores: tuple[str, ...] = (),
) -> DataFrame:
    """Downloader simulator (J3): corpus ⋈ broadcast(feed) + payload decode.

    Returns one decoded row per feed row that HAS a corpus entry; feed rows
    with no entry (404s) are detected by the caller with an anti-join against
    this (cached, ≤ batch-size) result — see ``CrawlLoop.run_iteration``.

    ``server_ignores`` models a server that disregards the named query
    params for routing (session/tracking ids — the DUST fixture,
    core/dust.py): the corpus lookup key is the feed URL with those params
    stripped, while the RESULT row keeps the URL as requested — exactly a
    real fetcher, where the frontier's URL and the server's routing
    decision are independent. The strip is a codegen projection on the
    broadcast (≤ batch-size) side only.

    Plan shape: an INNER join may build either side, so ``broadcast(feed)``
    is honored and the corpus side streams map-side with zero shuffle (the
    earlier left-outer form could not build the preserved feed side — Spark
    dropped the hint and sort-merge-shuffled the entire corpus, ``bytes``
    column included, every iteration). Only this stage ever reads ``bytes``
    (parquet column pruning keeps it out of every other scan — SURVEY.md
    §7.4.4).
    """
    pages = corpus.select(
        F.col("url").alias("canonical_url"),
        "image_id",
        "bytes",
        "fmt",
        "caption",
        "phash",
        "out_links",
    )
    if server_ignores:
        from frontera_spark.core.dust import strip_named_params_expr

        feed_keyed = feed.select(*FEED_COLS).withColumn(
            "_fetch_key",
            strip_named_params_expr(F.col("canonical_url"), tuple(server_ignores)),
        )
        joined = (
            pages.withColumnRenamed("canonical_url", "_fetch_key")
            .join(F.broadcast(feed_keyed), "_fetch_key", "inner")
            .drop("_fetch_key")
        )
    else:
        joined = pages.join(F.broadcast(feed.select(*FEED_COLS)), "canonical_url", "inner")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from frontera_spark.operators.multimodal import decode_image
        from frontera_spark.sources.corpus import caption_of, raw_pixels
        from frontera_spark.sources.png import psnr

        for pdf in batches:
            out = pdf[
                [
                    "fingerprint",
                    "canonical_url",
                    "host",
                    "partition_id",
                    "seq",
                    "depth",
                    "jid",
                    "image_id",
                    "caption",
                    "phash",
                    "out_links",
                ]
            ].copy()
            n_bytes, psnrs, inv_ok, cap_ok = [], [], [], []
            for raw, image_id, caption in zip(pdf["bytes"], pdf["image_id"], pdf["caption"]):
                n_bytes.append(len(raw))
                if not check_invariant:
                    psnrs.append(None)
                    inv_ok.append(True)
                    cap_ok.append(True)
                    continue
                idx = int(image_id[3:])
                px = decode_image(bytes(raw))
                ref = raw_pixels(corpus_seed, idx)
                p = psnr(px, ref) if px.shape == ref.shape else 0.0
                # lossless rows decode bit-exact (inf dB); lossy rows —
                # 'qpng' (quantize step 2) and real 'jpeg' (q100 DCT
                # rounding, sources/jpeg.py) — land ≥ 40 dB; decode is
                # magic-byte dispatched so the loop is codec-agnostic
                psnrs.append(None if np.isinf(p) else float(p))
                inv_ok.append(bool(np.isinf(p) or p >= 40.0))
                cap_ok.append(caption == caption_of(idx))
            out["n_bytes"] = pd.Series(n_bytes, index=pdf.index, dtype="int32")
            out["psnr"] = pd.Series(psnrs, index=pdf.index, dtype="float64")
            out["invariant_ok"] = pd.Series(inv_ok, index=pdf.index, dtype="bool")
            out["caption_ok"] = pd.Series(cap_ok, index=pdf.index, dtype="bool")
            yield out[[c.split()[0] for c in FETCH_RESULT_SCHEMA.split(", ")]]

    return joined.mapInPandas(decode, FETCH_RESULT_SCHEMA)


def extract_links(
    results: DataFrame,
    parent_scores: DataFrame | None = None,
    cash_fn=None,
) -> DataFrame:
    """links_extracted input: (url, parent_seq, link_pos, depth) rows in the
    exact order the single-consumer reference ingests them.

    ``parent_scores`` (seq, score — the strategy's per-parent pricing frame,
    ``Strategy.parent_cash_frame``) turns on cash link pricing: each link
    carries ``_cash = cash_fn(parent score, outdeg)`` (default: OPIC's
    score/outdeg split; FocusedStrategy passes its full-strength
    inheritance). The join is batch×batch and the pricing side is
    broadcast, so it adds no shuffle."""
    links = results.select(
        F.col("seq").alias("parent_seq"),
        (F.col("depth") + 1).alias("depth"),
        F.size("out_links").alias("_nout"),
        F.posexplode("out_links").alias("link_pos", "url"),
    )
    if parent_scores is not None:
        if cash_fn is None:
            cash_fn = lambda pscore, nout: pscore / nout  # noqa: E731
        links = links.join(
            F.broadcast(
                parent_scores.select(
                    F.col("seq").alias("parent_seq"), F.col("score").alias("_pscore")
                )
            ),
            "parent_seq",
        ).withColumn("_cash", cash_fn(F.col("_pscore"), F.col("_nout")))
        return links.select("url", "parent_seq", "link_pos", "depth", "_cash")
    return links.select("url", "parent_seq", "link_pos", "depth")


class CrawlLoop:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        corpus_path: str,
        corpus_seed: int = 42,
        strategy: str = "bfs",
        batch_size: int = 64,
        max_per_host: int | None = None,
        n_partitions: int = 8,
        mode: str = "global",
        check_invariant: bool = True,
        robots_deny_hosts: frozenset | None = None,
        max_depth: int | None = None,
        politeness: DataFrame | None = None,
        batch_period: float = 1.0,
        token_cap: float = 8.0,
        min_requests: int | None = None,
        min_hosts: int | None = None,
        max_pending: int | None = None,
        strategy_obj=None,
        middlewares: list | None = None,
        robots_txt: dict[str, str] | None = None,
        canonical_solver: str = "basic",
        use_seen_shards: bool = False,
        shard_capacity: int = 1 << 20,
        trap_guard: dict | None = None,
        revisit: dict | None = None,
        dynamic_hosts: dict | None = None,
        retry: dict | None = None,
        flaky_hosts: dict | None = None,
        content_dedup: bool = False,
        content_shard_capacity: int = 1 << 16,
        dust: dict | None = None,
        server_ignores: tuple[str, ...] = (),
        throttle: dict | None = None,
        redirects: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.workdir = workdir
        self.corpus_seed = corpus_seed
        self.batch_size = batch_size
        self.max_per_host = max_per_host
        self.mode = mode
        self.check_invariant = check_invariant
        self.min_requests = min_requests
        self.min_hosts = min_hosts
        self.max_pending = max_pending
        # trap budget guard (engine.detect_trap_hosts → per-host pop caps):
        # {"every": k iterations between re-detections, "fanout_threshold":
        # templates-fanout trigger, "cap": per-pop budget for suspects}.
        # Applies to the plain pop path; the politeness scheduler already
        # bounds per-host rates by budget, so the guard is not forwarded.
        # 'every' is clamped to >= 1 at construction: 0 would divide-by-zero
        # the iteration modulus and a negative value would silently disable
        # detection.
        if trap_guard is not None:
            trap_guard = dict(trap_guard)
            trap_guard["every"] = max(1, int(trap_guard.get("every", 5)))
        self.trap_guard = trap_guard
        self._trap_caps: dict[str, int] = {}
        # adaptive revisit (X6 adaptive edition — engine.revisit_adaptive):
        # {"every": k iterations between re-schedule ticks, "bootstrap_after":
        # m or None — fixed-interval re-queue of CRAWLED pages (engine.revisit)
        # so pages accrue the >= 2 change observations the Cho–Garcia-Molina
        # estimator needs before it can take over}. A revisit-enabled crawl
        # has no natural exhaustion (that is the point of revisiting) —
        # callers bound it with run(max_iterations=...).
        if revisit is not None:
            revisit = dict(revisit)
            revisit["every"] = max(1, int(revisit.get("every", 5)))
            # "incremental" (default, the scale path): fold each tick's NEW
            # fetch-log slice into a per-page state table and schedule from
            # the fold — O(slice) per tick. "full": recompute over the whole
            # log — the reference policy the fold is pinned bit-equal to.
            mode = revisit.setdefault("mode", "incremental")
            if mode not in ("incremental", "full"):
                raise ValueError(f"revisit mode {mode!r}")
            # "conditional": True = conditional re-fetch (the HTTP 304 /
            # If-None-Match analog): a popped page whose CURRENT content
            # signature equals the revisit state's last seen one skips the
            # payload path entirely — no bytes read, no decode, no link
            # re-extraction — and still lands a fetch-log row (the
            # estimator's non-change observation) + CRAWLED transition.
            # Requires incremental mode (the state table holds last_sig).
            if revisit.get("conditional") and mode != "incremental":
                raise ValueError("conditional revisit requires incremental mode")
        self.revisit_cfg = revisit
        self._revisit_state = None  # lazy SnapshotTable (incremental mode)
        # simulator change model: host -> change period (iterations). A page
        # on a dynamic host has content version = iteration // period at
        # fetch time; the fetch log's content signature hashes that version,
        # standing in for the body checksum a real crawler would record.
        self.dynamic_hosts = dict(dynamic_hosts or {})
        self.fetchlog_dir = os.path.join(workdir, "fetchlog")
        # transient-error retry (core/retry.py): {"max_retries": n give-up
        # bound, "base_interval_s": backoff base on the crawl clock,
        # "max_backoff_exp": exponent cap, "every": k iterations between
        # ticks}. Error slices land in errorlog/iter=<i>/ and fold into a
        # per-page state table behind a committed high-water mark — the
        # same crash-consistent shape as the revisit fold.
        if retry is not None:
            retry = dict(retry)
            retry["every"] = max(1, int(retry.get("every", 1)))
            retry.setdefault("max_retries", 3)
            retry.setdefault("base_interval_s", 2)
            retry.setdefault("max_backoff_exp", 16)
        self.retry_cfg = retry
        self._retry_state = None  # lazy SnapshotTable
        # failure simulator: host -> k. A page on a flaky host FAILS its
        # first k fetch attempts (attempt number = folded error count + 1)
        # — the deterministic stand-in for timeouts/5xx. A real deployment
        # replaces this with the fetcher's retryable-status signal; the
        # retry policy itself is simulator-independent.
        self.flaky_hosts = dict(flaky_hosts or {})
        self.errorlog_dir = os.path.join(workdir, "errorlog")
        # content-level duplicate detection (mirror handling — Heritrix's
        # "identical digest" idea): a fetched page whose content signature
        # was already seen at another URL still takes its CRAWLED
        # transition, but its links are NOT extracted — mirrored bodies
        # carry mirrored outlinks, so extracting them again just schedules
        # the mirror's whole subtree. First occurrence per signature (by
        # min seq — discovery order — within a batch, then first iteration
        # across batches) wins. Signatures land in contentlog/iter=<i>/ with the
        # same overwrite-on-replay + read-only-iters-below-current contract
        # as the fetch log, so rollback/resume replays are exact. The
        # cross-iteration check routes through the SAME bloom/cuckoo shard
        # layer as URL fingerprints (core/seen.py, sharded by sig % P): a
        # batch whose winners are all "definitely new" never touches the
        # signature log at all, so the per-iteration cost is O(batch) —
        # the exact log scan runs only for the bloom-maybe minority
        # (true mirrors + ~0.06% FP), exactly the frontier's URL-dedup
        # shape. Blooms are add-only, which is safe under rollback: a
        # replayed iteration sees extra "maybe"s that the exact anti-join
        # (restricted to iters < current) resolves; missing shards are
        # rebuilt from the logs in _recover().
        self.content_dedup = bool(content_dedup)
        self.contentlog_dir = os.path.join(workdir, "contentlog")
        self.content_seen = None
        if self.content_dedup:
            from frontera_spark.core.seen import SeenShards

            # shards live at contentlog/seen_shards — beside the exact log
            # they summarize, excluded from the iter=* glob. Bloom-only
            # (content sigs are never deleted) and sized per shard by the
            # knob: shard bytes = 2 × capacity, and every iteration pays
            # write+fsync+reload of the touched shards, so an oversized
            # capacity taxes EVERY iteration — size to expected crawl
            # pages ÷ n_partitions (overfill only raises the bloom FP,
            # costing extra exact-log checks, never correctness).
            self.content_seen = SeenShards(
                self.contentlog_dir,
                capacity=content_shard_capacity,
                bloom_only=True,
            )
        # DUST rule mining (core/dust.py — Bar-Yossef et al. WWW'07):
        # {"every": k iterations between mining ticks, "min_support": s}.
        # Each iteration appends this batch's (host, url, sig) rows to
        # dustlog/iter=<i>/ (overwrite-on-replay, read-only-below-current —
        # the fetch-log contract, so rollback replays re-mine identically);
        # every k iterations the log is mined for per-(host, param)
        # content-irrelevance rules, and validated rules rewrite candidate
        # links BEFORE they enter the frontier — aliases collapse in the
        # seen-set instead of being fetched. Mining is O(crawled-so-far)
        # once per k iterations (the OPIC-refresh cost class); rules are
        # NOT persisted — they are a pure function of the logs, re-mined in
        # _recover(), which keeps them rollback-exact for free.
        # ``server_ignores`` is the matching SIMULATOR knob (which params
        # the fake server drops for routing — the ground truth mining is
        # supposed to discover); a real deployment deletes it.
        if dust is not None:
            dust = dict(dust)
            dust["every"] = max(1, int(dust.get("every", 5)))
            dust.setdefault("min_support", 2)
        self.dust_cfg = dust
        self._dust_rules: dict[str, list[str]] = {}
        self.dustlog_dir = os.path.join(workdir, "dustlog")
        self.server_ignores = tuple(server_ignores)
        # robots_txt: {host: robots.txt body} — ONE knob that derives the
        # whole robots stack (frontera analog: scrapy's RobotsTxtMiddleware
        # + DOWNLOAD_DELAY, per-process crawler settings; here both live in
        # the scheduler so every partition enforces them):
        #   - path gating: parsed rules (RFC 9309 prefixes + */$ wildcards)
        #     become a robots_middleware on the schedule path, so denied
        #     links never enter the frontier;
        #   - politeness: each group's Crawl-delay becomes the host's
        #     token-bucket refill interval and bare full bans pre-mark the
        #     host SKIPPED_ROBOTS (policies_from_robots), turning on the
        #     PoliteScheduler unless an explicit `politeness` frame already
        #     carries hand-tuned policies (explicit wins; the middleware
        #     still gates paths either way).
        if robots_txt is not None:
            from frontera_spark.core.robots import (
                policies_from_robots,
                robots_middleware,
                rules_df,
            )

            middlewares = list(middlewares or [])
            middlewares.append(robots_middleware(rules_df(spark, robots_txt)))
            if politeness is None:
                politeness = policies_from_robots(spark, robots_txt)
        self.engine = FrontierEngine(
            spark,
            workdir,
            n_partitions=n_partitions,
            strategy=strategy_obj if strategy_obj is not None else strategy,
            robots_deny_hosts=robots_deny_hosts,
            max_depth=max_depth,
            canonical_solver=canonical_solver,
            middlewares=middlewares,
            use_seen_shards=use_seen_shards,
            shard_capacity=shard_capacity,
        )
        self.corpus = spark.read.parquet(corpus_path)
        self.metrics_dir = os.path.join(workdir, "metrics")
        self.scheduler = None
        if politeness is not None:
            from frontera_spark.core.politeness import DomainMetadata, PoliteScheduler

            domains = DomainMetadata(spark, workdir, n_partitions, token_cap=token_cap)
            if domains.table.snapshot_id == 0:  # fresh table: load policies once
                domains.set_policies(politeness)
            self.scheduler = PoliteScheduler(
                self.engine, domains, batch_period=batch_period, token_cap=token_cap
            )
        # AIMD politeness throttle (core/throttle.py — scrapy AutoThrottle /
        # frontera DOWNLOAD_DELAY analog): {"every": k iterations between
        # controller ticks, plus any aimd_delay knob: err_threshold,
        # backoff, relief_s, min_delay_s, max_delay_s}. Each iteration adds
        # one tiny union-agg job over the cached pop/results frames to
        # accumulate per-host (ok, err) counts driver-side; each tick MERGEs
        # the AIMD-adjusted delay_s into the domain table, where the very
        # next pop's token buckets pick it up. Controller state IS the
        # committed delay_s column — a crash loses at most the current
        # partial observation window, which the controller re-accumulates
        # (self-correcting by construction; no extra state table).
        if throttle is not None:
            if self.scheduler is None:
                raise ValueError(
                    "throttle requires politeness (pass politeness= or robots_txt=)"
                )
            throttle = dict(throttle)
            throttle["every"] = max(1, int(throttle.get("every", 5)))
        self.throttle_cfg = throttle
        self._throttle_window: dict[str, list[int]] = {}
        # HTTP 3xx redirect simulator: {requested canonical_url: Location
        # target}. A popped row whose URL the map covers never reaches the
        # payload join (no body at the old address): it takes its CRAWLED
        # transition with zero bytes and its Location target is scheduled
        # as a LINK from the source (parent_seq = source seq, link_pos 0,
        # SAME depth — scrapy's RedirectMiddleware semantics: a redirect is
        # the same document moving, not a deeper discovery). The target
        # then rides the NORMAL schedule path, so seen-dedup collapses
        # already-crawled targets, robots middleware gates denied ones, and
        # multi-hop chains resolve one hop per iteration — cycles die in
        # the seen-set, and chain length is bounded by the (finite) map,
        # so no hop cap is needed. A real deployment replaces this map
        # with the fetcher's 3xx status + Location header (the same
        # contract as flaky_hosts standing in for timeouts).
        self.redirects = dict(redirects or {})

    # ------------------------------------------------------------------ state

    def _recover(self) -> None:
        """Re-queue rows marked into a feed batch but never crawled (a crash
        between mark and page_crawled): clear their batch_id so the next pop
        sees them again. Fetching is deterministic → replay is idempotent."""
        if self.content_seen is not None:
            self._recover_content_seen()
        if self.dust_cfg is not None:
            # rules are a pure function of the (rollback-exact) dust logs:
            # re-mine at the boundary the interrupted run last ticked at
            # (MINED_AT watermark), clamped to the current iteration's tick
            # boundary for rollback (stale future logs fall outside the
            # read set either way) — restoring the precise rule set the
            # interrupted process held
            every = self.dust_cfg["every"]
            boundary = (self.engine.iteration // every) * every
            wm = os.path.join(self.dustlog_dir, "MINED_AT")
            if os.path.exists(wm):
                with open(wm) as fh:
                    boundary = min(boundary, int(fh.read().strip() or 0))
            self._mine_dust(boundary)
        t = self.engine.table
        # un-absorbed overlay marks are exactly the in-flight feed rows whose
        # results never committed — dropping them re-queues those rows with a
        # metadata-only commit, no data rewrite
        t.clear_marks()
        # marks that a COW merge already absorbed into base batch_id (e.g.
        # page_crawled rewrote the partition while sibling rows were still in
        # flight) need the data-path clear below
        stuck = t.read().filter(
            (F.col("state") == STATE_QUEUED) & F.col("batch_id").isNotNull()
        )
        pid_rows = stuck.groupBy("partition_id").count().collect()
        if not pid_rows:
            return
        src = stuck.withColumn("batch_id", F.lit(None).cast("long"))
        t.upsert(
            src,
            set_cols=["batch_id"],
            insert=False,
            affected_pids=[r["partition_id"] for r in pid_rows],
        )

    def _recover_content_seen(self) -> None:
        """Rebuild the content-sig bloom shards from the exact logs if they
        lag (lost/partial shard files, a crash between the log write and
        the shard add). Shards AHEAD of the current iteration — a rollback
        — are safe as-is: extra bloom bits only cause "maybe"s, and the
        exact anti-join is already restricted to iters < current. Shards
        BEHIND the newest prior log would cause unsafe "definitely new"
        verdicts, so that is the rebuild trigger. One O(crawled-so-far)
        scan, paid only on an inconsistent resume — never per iteration."""
        dirs = self._content_log_dirs(self.engine.iteration)
        if not dirs:
            return
        max_logged = max(int(d.rsplit("=", 1)[1]) for d in dirs)
        if self.content_seen.synced_gen() >= max_logged:
            return
        self.content_seen.rebuild(
            self.spark.read.parquet(*dirs)
            .select(F.col("sig").alias("_sig"))
            .select(
                self._sig_shard_col().alias("partition_id"),
                F.col("_sig").alias("fingerprint"),
            )
        )
        self.content_seen.commit(max_logged)

    # -------------------------------------------------------------- revisit

    def _content_sig(self, iteration: int):
        """Content signature of a fetched page at ``iteration`` — the
        simulator's stand-in for hashing the downloaded body. Dynamic hosts'
        version advances every ``period`` iterations; everything else is
        version 0 forever. Pure projection (map lookup + xxhash64)."""
        version = F.lit(0).cast("long")
        if self.dynamic_hosts:
            periods = F.create_map(
                *[F.lit(x) for kv in self.dynamic_hosts.items() for x in kv]
            )
            version = F.coalesce(
                F.floor(F.lit(iteration) / periods[F.col("host")]).cast("long"),
                F.lit(0).cast("long"),
            )
        return F.xxhash64(F.col("image_id"), version)

    def _append_fetch_log(self, iteration: int, results: DataFrame) -> None:
        """One narrow row per fetched page: (fingerprint, partition_id,
        iteration, sig). Written per-iteration into ``iter=<i>/`` with
        overwrite semantics, so a replayed iteration leaves one copy (same
        resume contract as metrics). O(batch) rows; the write only runs when
        revisit is configured."""
        (
            results.select(
                "fingerprint",
                "partition_id",
                F.lit(iteration).alias("iteration"),
                self._content_sig(iteration).alias("sig"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(self.fetchlog_dir, f"iter={iteration}"))
        )

    def _content_log_dirs(self, iteration: int) -> list[str]:
        """Signature-log dirs strictly below ``iteration`` — the
        rollback-exact read set (stale future logs are ignored, then
        overwritten as a replay reaches them). Dirs with no parquet files
        are skipped: legitimate when an iteration had zero winners, and the
        safe reading of a dir created but never populated (a crash between
        the replay's mkdir and the journaled add)."""
        import glob as _glob

        return [
            d
            for d in _glob.glob(os.path.join(self.contentlog_dir, "iter=*"))
            if int(d.rsplit("=", 1)[1]) < iteration
            and any(f.endswith(".parquet") for f in os.listdir(d))
        ]

    def _sig_shard_col(self):
        """Shard id for a content signature: sig % P (non-negative)."""
        return F.pmod(F.col("_sig"), F.lit(self.engine.n_partitions)).cast("int")

    # -------------------------------------------------------------- throttle

    def _accumulate_throttle_window(self, feed, results, notmod, redirected=None) -> None:
        """Fold this iteration's per-host outcomes into the observation
        window: ok = fetched + not-modified + redirected visits (a 304 or
        3xx is a server RESPONSE, not pressure), err = popped rows that
        produced none of those (404s, flaky failures — any failed fetch
        counts as pressure). One union-agg job over frames that are
        already cached and <= batch-size; the window dict is bounded by
        hosts touched since the last tick (the politeness cardinality
        class)."""
        obs = feed.select(
            "host", F.lit(1).alias("_p"), F.lit(0).alias("_ok")
        ).unionByName(
            results.select("host", F.lit(0).alias("_p"), F.lit(1).alias("_ok"))
        )
        if notmod is not None:
            obs = obs.unionByName(
                notmod.select("host", F.lit(0).alias("_p"), F.lit(1).alias("_ok"))
            )
        if redirected is not None:
            obs = obs.unionByName(
                redirected.select("host", F.lit(0).alias("_p"), F.lit(1).alias("_ok"))
            )
        for r in (
            obs.groupBy("host")
            .agg(F.sum("_p").alias("_p"), F.sum("_ok").alias("_ok"))
            .collect()
        ):
            ok, err = int(r["_ok"]), int(r["_p"]) - int(r["_ok"])
            w = self._throttle_window.setdefault(r["host"], [0, 0])
            w[0] += ok
            w[1] += max(err, 0)

    def _throttle_tick(self) -> int:
        """Apply one AIMD adjustment: MERGE the controller's new delay_s
        for every host observed since the last tick into the domain
        table (policy rows only — hosts without a politeness policy have
        no bucket to throttle). Returns hosts updated."""
        from frontera_spark.core.throttle import aimd_delay

        if not self._throttle_window:
            return 0
        cfg = self.throttle_cfg
        obs = self.spark.createDataFrame(
            [
                (h, int(o), int(e))
                for h, (o, e) in sorted(self._throttle_window.items())
            ],
            "host string, _ok long, _err long",
        )
        dom = self.scheduler.domains.table
        knobs = {
            k: float(cfg[k])
            for k in ("err_threshold", "backoff", "relief_s", "min_delay_s", "max_delay_s")
            if k in cfg
        }
        src = (
            dom.read()
            .join(F.broadcast(obs), "host", "inner")
            .withColumn(
                "delay_s",
                aimd_delay(F.col("delay_s"), F.col("_ok"), F.col("_err"), **knobs),
            )
            .drop("_ok", "_err")
        )
        n = dom.upsert(src, set_cols=["delay_s"], insert=False)
        self._throttle_window.clear()
        return n

    # ------------------------------------------------------------------ dust

    def _dust_log_dirs(self, iteration: int) -> list[str]:
        """DUST-log dirs strictly below ``iteration`` (the same
        rollback-exact read set as the content log)."""
        import glob as _glob

        return [
            d
            for d in _glob.glob(os.path.join(self.dustlog_dir, "iter=*"))
            if int(d.rsplit("=", 1)[1]) < iteration
            and any(f.endswith(".parquet") for f in os.listdir(d))
        ]

    def _append_dust_log(self, iteration: int, results: DataFrame) -> None:
        """One (host, url, sig) row per fetched page — the mining input.
        The URL is the REQUESTED one (aliases intact: that is the evidence),
        the sig is the body signature the alias resolved to."""
        (
            results.select(
                "host",
                F.col("canonical_url").alias("url"),
                self._content_sig(iteration).alias("sig"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(self.dustlog_dir, f"iter={iteration}"))
        )

    def _mine_dust(self, iteration: int) -> None:
        """Re-mine parameter-irrelevance rules from the full dust log and
        swap in the validated rule map (host -> params to strip). One
        O(crawled-so-far) aggregation per ``every`` iterations — the same
        cost class as an OPIC score refresh; the rule map itself is
        O(hosts x params) and rides the plan as a literal."""
        from frontera_spark.core.dust import mine_dust_rules, rules_to_map

        dirs = self._dust_log_dirs(iteration)
        if dirs:
            log = self.spark.read.parquet(*dirs)
            rules = mine_dust_rules(log, url_col="url", sig_col="sig", host_col="host")
            self._dust_rules = rules_to_map(
                rules, min_support=self.dust_cfg["min_support"]
            )
        else:
            self._dust_rules = {}
        # O(1) watermark breadcrumb: the boundary this process last mined
        # at, so _recover() restores the EXACT rule set (mining at the
        # final-iteration boundary instead could see evidence the run's
        # last tick had not — and hold different rules than the crashed
        # process did)
        os.makedirs(self.dustlog_dir, exist_ok=True)
        with open(os.path.join(self.dustlog_dir, "MINED_AT"), "w") as fh:
            fh.write(str(iteration))

    def _content_dedup_split(
        self, results: DataFrame, iteration: int, n_maybe: int, n_results: int
    ):
        """Mirror detection: split this batch's (cached) results into
        first-occurrence originals and content duplicates.

        Originals = one winner per content signature inside the batch (min
        seq — the single-consumer discovery order, so "first occurrence"
        matches the reference's sequential semantics and is deterministic
        across partitionings) that is also absent from every PRIOR
        iteration's signature log. ``n_maybe`` is the bloom-maybe count the
        caller already summed inside the lineage-counter job: 0 ⇒ every sig
        is definitely new and the exact log is never read; the anti-join
        runs only for the bloom-maybe minority — so a crawl of mostly-new
        content pays exactly ONE extra action per iteration: a journaled
        shard add (core/seen.py) whose per-shard tasks write the winners'
        signatures to contentlog/iter=<i>/shard-<s>.parquet AND fold them
        into the bloom/cuckoo shards in the same O(batch) job, the log
        landing in parallel per shard. The duplicate count falls out of the
        add's return value (rows offered = winners), not a count job.
        Returns (originals_frame, n_duplicates)."""
        from pyspark.sql.window import Window

        sigged = results.withColumn("_sig", self._content_sig(iteration))
        w = Window.partitionBy("_sig").orderBy("seq")
        firsts = (
            sigged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        dirs = self._content_log_dirs(iteration) if n_maybe else []
        if dirs:
            probe = self.content_seen.maybe_seen_udf()
            firsts = firsts.withColumn(
                "_maybe", probe(self._sig_shard_col(), F.col("_sig"))
            )
            known = self.spark.read.parquet(*dirs).select("sig").distinct()
            checked = firsts.filter(F.col("_maybe")).join(
                known, firsts["_sig"] == known["sig"], "left_anti"
            )
            firsts = firsts.filter(~F.col("_maybe")).unionByName(checked).drop("_maybe")
        originals = firsts.cache()
        # journaled add: the winners' signatures land in the exact log AND
        # the sig shards in one job; gen = the iteration whose log the
        # shards are synced through (the _recover() rebuild contract).
        # Re-adding on a rollback replay is idempotent — the directory is
        # cleared first so a replayed (shorter) winner set leaves no stale
        # shard files from the rolled-back run.
        log_dir = os.path.join(self.contentlog_dir, f"iter={iteration}")
        shutil.rmtree(log_dir, ignore_errors=True)
        os.makedirs(log_dir, exist_ok=True)
        n_originals = self.content_seen.add(
            originals.select(
                self._sig_shard_col().alias("partition_id"),
                F.col("_sig").alias("fingerprint"),
            ),
            journal_dir=log_dir,
        )
        self.content_seen.commit(iteration)
        # return the CACHED frame (caller drops _sig and unpersists this
        # handle — unpersisting a derived frame would leak the cache)
        return originals, int(n_results - n_originals)

    def _conditional_split(self, feed: DataFrame, iteration: int, pids: list[int]):
        """Conditional re-fetch split (HTTP 304 / If-None-Match analog).

        A real crawler sends the validator it stored at the last fetch; the
        server answers 304 for unchanged pages and the body is never
        transferred. Here the revisit state table's ``last_sig`` is the
        stored validator and the simulator's current content signature is
        the server's answer, so the split is two narrow joins:

        - probe: corpus(url, image_id) ⋈ broadcast(feed) — the ONLY corpus
          columns read; the ``bytes`` column (the 100 TB term) never leaves
          parquet for a not-modified row;
        - verdict: state(fingerprint, last_sig) ⋈ broadcast(probe), state
          scan pruned to the feed's partitions. cur == last ⇒ not modified.

        Pages not in the state table (first fetch, or no fold tick yet) and
        pages with no corpus row (404s) fall through to the full path —
        the conditional leg can only ever SKIP work proven skippable.

        Returns (feed_fetch, notmod, counts): the remaining full-fetch feed,
        the cached not-modified frame (FEED_COLS + image_id; None if empty),
        and its per-partition counts.
        """
        state = (
            self._revisit_state_table()
            .read()
            .filter(F.col("partition_id").isin(pids))
            .select("fingerprint", "last_sig")
        )
        probe = (
            self.corpus.select(F.col("url").alias("canonical_url"), "image_id")
            .join(F.broadcast(feed.select(*FEED_COLS)), "canonical_url", "inner")
            .withColumn("_cur_sig", self._content_sig(iteration))
        )
        notmod = (
            state.join(F.broadcast(probe), "fingerprint", "inner")
            .filter(F.col("_cur_sig") == F.col("last_sig"))
            .select(*FEED_COLS, "image_id")
            .cache()
        )
        counts = {
            r["partition_id"]: int(r["n"])
            for r in notmod.groupBy("partition_id").agg(F.count("*").alias("n")).collect()
        }
        if not counts:
            notmod.unpersist()
            return feed, None, {}
        feed_fetch = feed.join(
            F.broadcast(notmod.select("canonical_url")), "canonical_url", "left_anti"
        )
        return feed_fetch, notmod, counts

    def _revisit_tick(self) -> int:
        """Re-schedule recrawls from observed content changes.

        Change observations are consecutive fetch-log rows of a page whose
        signatures differ — one lag window keyed by fingerprint over the
        fetch log, timestamped on the deterministic crawl clock
        (``timestamp_seconds(iteration)``, the same clock the pop's
        ``crawl_at`` gate reads). The whole policy lives in
        ``core.revisit.fetchlog_schedule`` (oracle-paired as the
        ``revisit_backoff`` driver query): Cho–Garcia-Molina due times for
        pages with >= 2 observed changes, bootstrap interval with
        EXPONENTIAL BACKOFF for the rest. One ``engine.requeue_due`` MERGE
        applies both paths (CRAWLED rows only — QUEUED pages keep the due
        time they were re-queued under).

        Scale shape: the window + aggs are two hash shuffles over the fetch
        log, every ``every`` iterations. A 10^10-page deployment would fold
        the log incrementally instead (checkpoint per-page last-sig + change
        stats and union only new iterations); the estimator and MERGE paths
        are already O(changers).
        """
        import glob as _glob

        if not _glob.glob(os.path.join(self.fetchlog_dir, "iter=*")):
            return 0
        if self.revisit_cfg["mode"] == "incremental":
            return self._revisit_tick_incremental()
        from frontera_spark.core.revisit import fetchlog_schedule

        log = self.spark.read.option("basePath", self.fetchlog_dir).parquet(
            os.path.join(self.fetchlog_dir, "iter=*")
        )
        sched = fetchlog_schedule(
            log,
            base_interval_s=self.revisit_cfg.get("bootstrap_after"),
            max_backoff_exp=int(self.revisit_cfg.get("max_backoff_exp", 16)),
        )
        due = sched.join(
            log.select("fingerprint", "partition_id").distinct(), "fingerprint"
        ).select(
            "fingerprint",
            "partition_id",
            F.timestamp_micros(F.col("due_us")).alias("crawl_at"),
        )
        return self.engine.requeue_due(due)

    def _revisit_state_table(self):
        """Lazy per-page revisit-state SnapshotTable (REVISIT_STATE_DDL),
        keyed like the frontier and carrying the fold high-water iteration
        in its manifest meta — so a resumed crawl folds only the iterations
        appended since the last committed fold (replayed iterations rewrite
        their iter dir with deterministic identical content, so skipping
        already-folded ones is safe)."""
        if self._revisit_state is None:
            from frontera_spark.core.revisit import REVISIT_STATE_DDL
            from frontera_spark.plans.snapshot import SnapshotTable

            path = os.path.join(self.workdir, "revisit_state")
            if os.path.exists(os.path.join(path, "CURRENT")):
                self._revisit_state = SnapshotTable.load(self.spark, path)
            else:
                self._revisit_state = SnapshotTable.create(
                    self.spark, path, REVISIT_STATE_DDL, key=["fingerprint"]
                )
        return self._revisit_state

    def _revisit_tick_incremental(self) -> int:
        """The tick at scale: fold only the fetch-log iterations NEWER than
        the state table's committed high-water mark, then schedule and
        requeue ONLY the folded pages. Sufficient, not just cheaper: a page
        can only be CRAWLED (the one state requeue_due touches) by being
        fetched, and every fetch lands in some tick's slice — a page
        untouched since the last fold was already requeued by the tick that
        folded its last fetch (or has no schedule row in either mode). Cost
        per tick: one window + one agg over the slice, a slice-pruned state
        join, and two partition-pruned MERGEs — O(slice), never O(history)
        like the full recompute."""
        import glob as _glob

        from frontera_spark.core.revisit import fold_fetch_slice, state_schedule

        tbl = self._revisit_state_table()
        hw = int(tbl.manifest().get("meta", {}).get("folded_iter", -1))
        its = sorted(
            (int(d.rsplit("=", 1)[1]), d)
            for d in _glob.glob(os.path.join(self.fetchlog_dir, "iter=*"))
            if int(d.rsplit("=", 1)[1]) > hw
        )
        if not its:
            return 0
        fetch_slice = self.spark.read.parquet(*[d for _, d in its])
        # every slice page yields exactly one folded row, so the slice's
        # partitions ARE the fold's affected partitions — one collect, and
        # the state read prunes to those partitions before the key semi-join
        pids = [
            r["partition_id"]
            for r in fetch_slice.select("partition_id").distinct().collect()
        ]
        if not pids:
            return 0
        state_sub = (
            tbl.read(with_marks=False)
            .filter(F.col("partition_id").isin(pids))
            .join(
                F.broadcast(fetch_slice.select("fingerprint").distinct()),
                "fingerprint",
                "left_semi",
            )
        )
        folded = fold_fetch_slice(state_sub, fetch_slice).cache()
        tbl.upsert(folded, meta={"folded_iter": its[-1][0]}, affected_pids=pids)
        sched = state_schedule(
            folded,
            base_interval_s=self.revisit_cfg.get("bootstrap_after"),
            max_backoff_exp=int(self.revisit_cfg.get("max_backoff_exp", 16)),
        )
        due = sched.join(folded.select("fingerprint", "partition_id"), "fingerprint").select(
            "fingerprint",
            "partition_id",
            F.timestamp_micros(F.col("due_us")).alias("crawl_at"),
        )
        n = self.engine.requeue_due(due)
        folded.unpersist()
        return n

    def _revisit_pending(self) -> bool:
        """True while a future tick can still produce work: any QUEUED row
        (due later on the clock) or, with a bootstrap interval, any CRAWLED
        row (the next tick re-queues it)."""
        from frontera_spark import STATE_CRAWLED

        states = [STATE_QUEUED]
        if self.revisit_cfg.get("bootstrap_after"):
            states.append(STATE_CRAWLED)
        return not self.engine.table.read().filter(F.col("state").isin(states)).isEmpty()

    # --------------------------------------------------------------- retry

    def _retry_state_table(self):
        """Lazy per-page retry-state SnapshotTable (RETRY_STATE_DDL), keyed
        like the frontier, fold high-water in its manifest meta — the same
        resume contract as the revisit state: replayed iterations rewrite
        their errorlog dir with deterministic identical content, so skipping
        already-folded ones is safe."""
        if self._retry_state is None:
            from frontera_spark.core.retry import RETRY_STATE_DDL
            from frontera_spark.plans.snapshot import SnapshotTable

            path = os.path.join(self.workdir, "retry_state")
            if os.path.exists(os.path.join(path, "CURRENT")):
                self._retry_state = SnapshotTable.load(self.spark, path)
            else:
                self._retry_state = SnapshotTable.create(
                    self.spark, path, RETRY_STATE_DDL, key=["fingerprint"]
                )
        return self._retry_state

    def _append_error_log(self, iteration: int, errored: DataFrame) -> None:
        """(fingerprint, partition_id, iteration) per errored page, written
        into errorlog/iter=<i>/ with overwrite semantics (one copy after a
        replay). O(errors-this-iteration) rows."""
        (
            errored.select(
                "fingerprint",
                "partition_id",
                F.lit(iteration).alias("iteration"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(self.errorlog_dir, f"iter={iteration}"))
        )

    def _retry_tick(self) -> int:
        """Fold error-log slices newer than the committed high-water mark
        into the per-page retry state, then re-queue every page the policy
        still allows (core/retry.py retry_schedule) at its exponential-
        backoff due time — ``requeue_due(from_state=STATE_ERROR)`` flips
        retryable ERROR rows back to QUEUED. Pages past ``max_retries``
        stay ERROR for good. O(new errors) per tick: one hash agg over the
        slice, a partition-pruned state join, two partition-pruned MERGEs.
        """
        import glob as _glob

        from frontera_spark import STATE_ERROR
        from frontera_spark.core.retry import fold_error_slice, retry_schedule

        tbl = self._retry_state_table()
        hw = int(tbl.manifest().get("meta", {}).get("folded_iter", -1))
        its = sorted(
            (int(d.rsplit("=", 1)[1]), d)
            for d in _glob.glob(os.path.join(self.errorlog_dir, "iter=*"))
            if int(d.rsplit("=", 1)[1]) > hw
        )
        if not its:
            return 0
        err_slice = self.spark.read.parquet(*[d for _, d in its])
        pids = [
            r["partition_id"]
            for r in err_slice.select("partition_id").distinct().collect()
        ]
        if not pids:
            return 0
        state_sub = (
            tbl.read(with_marks=False)
            .filter(F.col("partition_id").isin(pids))
            .join(
                F.broadcast(err_slice.select("fingerprint").distinct()),
                "fingerprint",
                "left_semi",
            )
        )
        folded = fold_error_slice(state_sub, err_slice).cache()
        tbl.upsert(folded, meta={"folded_iter": its[-1][0]}, affected_pids=pids)
        cfg = self.retry_cfg
        sched = retry_schedule(
            folded,
            max_retries=cfg["max_retries"],
            base_interval_s=cfg["base_interval_s"],
            max_backoff_exp=cfg["max_backoff_exp"],
        )
        due = (
            sched.filter(F.col("action") == "retry")
            .join(folded.select("fingerprint", "partition_id"), "fingerprint")
            .select(
                "fingerprint",
                "partition_id",
                F.timestamp_micros(F.col("due_us")).alias("crawl_at"),
            )
        )
        n = self.engine.requeue_due(due, from_state=STATE_ERROR)
        folded.unpersist()
        return n

    def _retry_pending(self) -> bool:
        """True while a future tick can still produce work: un-folded error
        slices remain, or any QUEUED row exists (a retried page due later
        on the clock). give_up pages are ERROR — never pending."""
        import glob as _glob

        tbl = self._retry_state_table()
        hw = int(tbl.manifest().get("meta", {}).get("folded_iter", -1))
        if any(
            int(d.rsplit("=", 1)[1]) > hw
            for d in _glob.glob(os.path.join(self.errorlog_dir, "iter=*"))
        ):
            return True
        return not (
            self.engine.table.read()
            .filter(F.col("state") == STATE_QUEUED)
            .isEmpty()
        )

    def _drop_flaky_failures(self, results: DataFrame, pids: list) -> DataFrame:
        """Apply the transient-failure simulator: drop results rows whose
        page is on a flaky host with fewer prior errors than its configured
        failure count. Dropped rows fall out of the results frame, so the
        existing popped−fetched arithmetic counts them as errors and the
        fused ingest marks them STATE_ERROR — exactly the 404 path, except
        the retry tick later re-queues them."""
        k_map = F.create_map(
            *[F.lit(x) for kv in self.flaky_hosts.items() for x in kv]
        )
        prior = F.lit(0).cast("long")
        if self.retry_cfg is not None:
            st = (
                self._retry_state_table()
                .read(with_marks=False)
                .filter(F.col("partition_id").isin(pids))
                .select("fingerprint", "n_errors")
            )
            results = results.join(F.broadcast(st), "fingerprint", "left")
            prior = F.coalesce(F.col("n_errors"), F.lit(0).cast("long"))
        k = k_map[F.col("host")]
        fail = k.isNotNull() & (prior < k)
        out = results.filter(~fail)
        return out.drop("n_errors") if "n_errors" in out.columns else out

    def add_seeds(self, urls: list[str]) -> int:
        seeds = self.spark.createDataFrame(
            [(u, i) for i, u in enumerate(urls)], "url string, seq int"
        )
        return self.engine.add_seeds(seeds)

    # ------------------------------------------------------------------- loop

    def run_iteration(self) -> dict:
        """One micro-batch; returns the iteration's aggregate metrics row."""
        t0 = time.perf_counter()
        if self.scheduler is not None:
            feed = self.scheduler.pop(
                self.batch_size, max_per_host=self.max_per_host, mode=self.mode
            )
        else:
            if self.trap_guard and self.engine.iteration % self.trap_guard.get("every", 5) == 0:
                hot = self.engine.detect_trap_hosts(
                    fanout_threshold=self.trap_guard.get("fanout_threshold", 50.0)
                )
                cap = int(self.trap_guard.get("cap", 8))
                self._trap_caps = {h: cap for h in hot}
            feed = self.engine.get_next_requests(
                self.batch_size,
                max_per_host=self.max_per_host,
                mode=self.mode,
                min_requests=self.min_requests,
                min_hosts=self.min_hosts,
                max_pending=self.max_pending,
                host_caps=self._trap_caps or None,
            )
        iteration = self.engine.iteration
        # the pop already counted its batch per partition (its grouped
        # collect) — no isEmpty/count job on the feed here. One-shot read:
        # take_pop_counts raises if the pop path forgot its bookkeeping
        # (the 404 arithmetic below must use THIS pop's counts, never stale)
        popped_by_pid = self.engine.take_pop_counts()
        if not popped_by_pid:
            feed.unpersist()
            return {"iteration": iteration, "n_fetched": 0}

        # conditional re-fetch (HTTP 304 analog): carve proven-unchanged
        # revisits out of the payload path BEFORE the bytes-bearing join.
        # Gated on the state table existing — before the first fold tick
        # every pop takes the full path (the safe fallback).
        feed_fetch, notmod, n_notmod_by_pid = feed, None, {}
        if (
            self.revisit_cfg is not None
            and self.revisit_cfg.get("conditional")
            and os.path.exists(
                os.path.join(self.workdir, "revisit_state", "CURRENT")
            )
        ):
            feed_fetch, notmod, n_notmod_by_pid = self._conditional_split(
                feed, iteration, sorted(popped_by_pid)
            )

        # 3xx split: rows whose URL the redirect map covers skip the payload
        # join entirely (literal-map lookup, no join; the one count job runs
        # only when a redirect map is configured)
        redirected, n_redir_by_pid = None, {}
        if self.redirects:
            rmap = F.create_map(
                *[F.lit(x) for kv in sorted(self.redirects.items()) for x in kv]
            )
            tagged = feed_fetch.withColumn("_loc", rmap[F.col("canonical_url")])
            redirected = tagged.filter(F.col("_loc").isNotNull()).cache()
            n_redir_by_pid = {
                r["partition_id"]: int(r["n"])
                for r in redirected.groupBy("partition_id")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            if n_redir_by_pid:
                feed_fetch = tagged.filter(F.col("_loc").isNull()).drop("_loc")
            else:
                redirected.unpersist()
                redirected = None
        results = fetch_stage(
            feed_fetch,
            self.corpus,
            self.corpus_seed,
            self.check_invariant,
            server_ignores=self.server_ignores,
        )
        if self.flaky_hosts:
            results = self._drop_flaky_failures(results, sorted(popped_by_pid))
        results = results.cache()

        # per-partition lineage counters (BASELINE north_rule: checkpointed
        # resume **with per-partition lineage and counters**) — this collect
        # also fills the results cache; the fused merge gets the update
        # partitions for free (no probe job inside the engine)
        stats_src = results
        agg_cols = [
            F.count("*").alias("n_fetched"),
            F.sum(F.size(F.coalesce("out_links", F.array()))).alias("n_links"),
            F.sum("n_bytes").alias("bytes_fetched"),
            F.min("psnr").alias("psnr_min"),
            F.count(F.when(~F.col("invariant_ok") | ~F.col("caption_ok"), 1)).alias(
                "invariant_violations"
            ),
        ]
        if self.content_dedup:
            # the content-dedup bloom gate rides inside this existing job:
            # _maybe depends only on _sig, and every window winner's sig
            # appears here, so "any maybe among results" == "any maybe
            # among winners" — zero extra actions to decide whether the
            # exact signature log must be read this iteration
            stats_src = results.withColumn("_sig", self._content_sig(iteration))
            agg_cols.append(
                F.sum(
                    self.content_seen.maybe_seen_udf()(
                        self._sig_shard_col(), F.col("_sig")
                    ).cast("long")
                ).alias("n_sig_maybe")
            )
        mrows = stats_src.groupBy("partition_id").agg(*agg_cols).collect()
        # 404s arithmetically: every popped row either fetched or had no
        # corpus entry, so errors per partition = popped − fetched (no
        # anti-join count job). The errored ROWS themselves are only built
        # (lazily, against the cached ≤batch-size results) when any exist.
        if self.revisit_cfg is not None:
            logged = results
            if notmod is not None:
                # not-modified rows land in the log too — the estimator's
                # non-change observation; their sig recomputes to last_sig
                cols = ["fingerprint", "partition_id", "host", "image_id"]
                logged = results.select(*cols).unionByName(notmod.select(*cols))
            self._append_fetch_log(iteration, logged)
        if self.dust_cfg is not None:
            self._append_dust_log(iteration, results)
        if self.throttle_cfg is not None:
            self._accumulate_throttle_window(feed, results, notmod, redirected)
        fetched_by_pid = {r["partition_id"]: int(r["n_fetched"]) for r in mrows}
        for pid, n in n_notmod_by_pid.items():  # a 304 is a successful visit
            fetched_by_pid[pid] = fetched_by_pid.get(pid, 0) + n
        for pid, n in n_redir_by_pid.items():  # a 3xx resolves its popped row
            fetched_by_pid[pid] = fetched_by_pid.get(pid, 0) + n
        err_by_pid = {
            pid: n - fetched_by_pid.get(pid, 0)
            for pid, n in popped_by_pid.items()
            if n - fetched_by_pid.get(pid, 0) > 0
        }
        n_err = sum(err_by_pid.values())
        missing = (
            feed_fetch.select(*FEED_COLS).join(
                F.broadcast(results.select("canonical_url")),
                "canonical_url",
                "left_anti",
            )
            if n_err
            else None
        )
        if self.retry_cfg is not None and missing is not None:
            self._append_error_log(iteration, missing)
        # every popped row transitions (CRAWLED or ERROR) — the update
        # partitions are exactly the popped ones
        upd_pids = sorted(popped_by_pid)

        # content-level dedup (mirror handling): duplicates keep their
        # CRAWLED transition below but contribute no links
        link_src = results
        dedup_frame = None
        n_content_dups = n_sig_maybe = 0
        if self.content_dedup:
            n_sig_maybe = sum(int(r["n_sig_maybe"]) for r in mrows)
            dedup_frame, n_content_dups = self._content_dedup_split(
                results,
                iteration,
                n_maybe=n_sig_maybe,
                n_results=sum(int(r["n_fetched"]) for r in mrows),
            )
            link_src = dedup_frame.drop("_sig")

        # fully fused spider-log ingestion: CRAWLED/ERROR transitions AND the
        # new links' QUEUED inserts land in ONE MERGE commit per iteration
        strat = self.engine.strategy
        links = extract_links(
            link_src,
            parent_scores=(
                strat.parent_cash_frame(feed, link_src)
                if strat.accumulates_cash
                else None
            ),
            cash_fn=strat.link_cash,
        )
        if redirected is not None:
            # the Location target enters the frontier as a LINK from the
            # source row: same depth (a redirect is the same document
            # moving), link_pos 0 (a redirect source has no body, so no
            # extracted links compete for the slot), full cash transfer
            # for accumulating strategies (it IS the page the cash priced)
            rl_cols = [
                F.col("_loc").alias("url"),
                F.col("seq").alias("parent_seq"),
                F.lit(0).alias("link_pos"),
                F.col("depth").alias("depth"),
            ]
            if strat.accumulates_cash:
                rl_cols.append(F.col("score").alias("_cash"))
            links = links.unionByName(redirected.select(*rl_cols))
        if self.dust_cfg is not None and self._dust_rules:
            # collapse mined aliases BEFORE canonicalization/dedup: a
            # stripped link that matches an already-crawled URL dies in the
            # seen-set anti-join instead of being fetched (pure codegen
            # rewrite — no UDF, no extra shuffle on the links frame)
            from frontera_spark.core.dust import apply_dust_rules

            links = apply_dust_rules(links, self._dust_rules, url_col="url")
        crawled = results
        extra_visits = [f for f in (notmod, redirected) if f is not None]
        if extra_visits:
            # 304 and 3xx rows take the same CRAWLED transition in the same
            # fused commit — ingest only reads the key columns from them
            crawled = results.select("fingerprint", "partition_id", "jid")
            for f in extra_visits:
                crawled = crawled.unionByName(
                    f.select("fingerprint", "partition_id", "jid")
                )
        n_scheduled = self.engine.ingest_results(
            crawled, missing, links, update_pids=upd_pids
        )
        t_sec = time.perf_counter() - t0
        base = [r.asDict() for r in mrows]
        zero_byte_visits = dict(n_notmod_by_pid)
        for pid, n in n_redir_by_pid.items():  # 3xx rows: visits, no bytes
            zero_byte_visits[pid] = zero_byte_visits.get(pid, 0) + n
        for pid, n in zero_byte_visits.items():  # visits with zero bytes moved
            row = next((b for b in base if b["partition_id"] == pid), None)
            if row is None:
                base.append(
                    {
                        "partition_id": pid, "n_fetched": n, "n_links": 0,
                        "bytes_fetched": 0, "psnr_min": None,
                        "invariant_violations": 0,
                    }
                )
            else:
                row["n_fetched"] += n
        seen_pids = {r["partition_id"] for r in base}
        for pid, n in err_by_pid.items():  # partitions whose rows ALL 404'd
            if pid not in seen_pids:
                base.append(
                    {
                        "partition_id": pid, "n_fetched": 0, "n_links": 0,
                        "bytes_fetched": 0, "psnr_min": None,
                        "invariant_violations": 0,
                    }
                )
        mpdf = pd.DataFrame(base)
        mpdf["n_errors"] = mpdf["partition_id"].map(err_by_pid).fillna(0).astype("int64")
        mpdf["iteration"] = iteration
        mpdf["n_scheduled"] = n_scheduled  # batch-level (seq is global)
        mpdf["t_sec"] = t_sec
        mpdf = mpdf[[c.split()[0] for c in METRICS_SCHEMA.split(", ")]]
        self._write_metrics(iteration, mpdf)

        agg = {
            "iteration": iteration,
            "n_fetched": int(mpdf["n_fetched"].sum()),
            "n_links": int(mpdf["n_links"].sum()),
            "n_scheduled": n_scheduled,
            "n_errors": n_err,
            "bytes_fetched": int(mpdf["bytes_fetched"].sum()),
            "invariant_violations": int(mpdf["invariant_violations"].sum()),
            "t_sec": round(t_sec, 3),
        }
        if self.revisit_cfg is not None and self.revisit_cfg.get("conditional"):
            agg["n_not_modified"] = sum(n_notmod_by_pid.values())
        if self.redirects:
            agg["n_redirects"] = sum(n_redir_by_pid.values())
        if self.dust_cfg is not None:
            # rules active while THIS iteration's links were scheduled
            agg["n_dust_rules"] = sum(len(v) for v in self._dust_rules.values())
        if self.content_dedup:
            agg["n_content_dups"] = n_content_dups
            # bloom-maybe count: 0 ⇒ this iteration never read the
            # signature log (the scale observable the tests pin)
            agg["n_sig_maybe"] = n_sig_maybe
        if dedup_frame is not None:
            dedup_frame.unpersist()
        results.unpersist()
        if notmod is not None:
            notmod.unpersist()
        if redirected is not None:
            redirected.unpersist()
        feed.unpersist()
        return agg

    _METRICS_ARROW = None  # lazily-built pyarrow schema mirroring METRICS_SCHEMA

    def _write_metrics(self, iteration: int, mpdf: pd.DataFrame) -> None:
        """Driver-side parquet write of the iteration's lineage counters.

        The metrics frame is O(partitions) rows — launching a Spark write
        job for it costs more than the write itself (one full job + commit
        protocol per iteration). A pyarrow file in the same
        ``iter=<i>/part-0.parquet`` layout is byte-compatible with the
        ``spark.read.parquet`` consumer in ``metrics()``; replayed
        iterations overwrite (remove + rewrite) exactly like the old
        ``mode("overwrite")``, keeping resume single-copy semantics."""
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        if CrawlLoop._METRICS_ARROW is None:
            _PA_TYPES = {"int": pa.int32(), "long": pa.int64(), "double": pa.float64()}
            CrawlLoop._METRICS_ARROW = pa.schema(
                [
                    (c.split()[0], _PA_TYPES[c.split()[1]])
                    for c in METRICS_SCHEMA.split(", ")
                ]
            )
        table = pa.Table.from_pandas(
            mpdf, schema=CrawlLoop._METRICS_ARROW, preserve_index=False
        )
        out = os.path.join(self.metrics_dir, f"iter={iteration}")
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        tmp = os.path.join(out, "_tmp.parquet")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(out, "part-0.parquet"))

    def run(
        self,
        max_iterations: int = 10_000,
        verbose: bool = False,
        vacuum_every: int = 25,
        vacuum_keep: int = 10,
    ) -> list[dict]:
        """Crawl to exhaustion (or the iteration cap). Safe after a crash.

        Every ``vacuum_every`` iterations, snapshot dirs unreachable from the
        last ``vacuum_keep`` snapshots are dropped — a long crawl commits
        several snapshots per iteration and would otherwise accumulate one
        copy-on-write generation per MERGE forever. Resume depth = the
        retained window (any kept snapshot is a valid rollback point)."""
        self._recover()
        history = []
        for i in range(max_iterations):
            if vacuum_every and i and i % vacuum_every == 0:
                self.engine.table.vacuum(keep_last=vacuum_keep)
                if self.scheduler is not None:
                    self.scheduler.domains.table.vacuum(keep_last=vacuum_keep)
            # maintenance: fold append-accumulated leaf dirs (and any
            # over-long mark overlays) back to one dir per partition. The
            # check is manifest metadata only (zero Spark jobs); the rewrite
            # runs only when a partition's delta count crosses the bound, so
            # its cost amortizes over the appends that created the deltas —
            # Iceberg's rewrite_data_files scheduled inline.
            self.engine.compact_if_needed()
            if (
                self.revisit_cfg is not None
                and self.engine.iteration
                and self.engine.iteration % self.revisit_cfg["every"] == 0
            ):
                self._revisit_tick()
            if (
                self.retry_cfg is not None
                and self.engine.iteration
                and self.engine.iteration % self.retry_cfg["every"] == 0
            ):
                self._retry_tick()
            if (
                self.dust_cfg is not None
                and self.engine.iteration
                and self.engine.iteration % self.dust_cfg["every"] == 0
            ):
                self._mine_dust(self.engine.iteration)
            if (
                self.throttle_cfg is not None
                and self.engine.iteration
                and self.engine.iteration % self.throttle_cfg["every"] == 0
            ):
                self._throttle_tick()
            m = self.run_iteration()
            if verbose:
                print(m)
            if m["n_fetched"] == 0:
                # with politeness an empty tick may just mean "all hosts
                # throttled right now" — stop only when nothing can EVER be
                # served (robots/budget), mirroring oracle.can_make_progress
                if self.scheduler is not None and self.scheduler.has_pending():
                    continue
                # with revisiting an empty tick may mean "everything due
                # later on the clock" — keep ticking while re-queues remain
                # possible (bounded by max_iterations: revisiting crawls
                # have no natural exhaustion)
                if self.revisit_cfg is not None and self._revisit_pending():
                    continue
                # with retries an empty tick may mean "errored pages due
                # later on the backoff clock" — keep ticking while un-folded
                # error slices or re-queued rows remain (give_up pages are
                # terminal ERROR, so a retrying crawl still exhausts)
                if self.retry_cfg is not None and self._retry_pending():
                    continue
                break
            history.append(m)
        return history

    def metrics(self) -> DataFrame:
        return self.spark.read.option("basePath", self.metrics_dir).parquet(
            os.path.join(self.metrics_dir, "iter=*")
        )


def main() -> None:
    ap = argparse.ArgumentParser(description="Run a corpus-backed crawl loop.")
    ap.add_argument("--n-images", type=int, default=200)
    ap.add_argument("--n-hosts", type=int, default=7)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--strategy", default="bfs",
                    help="fifo/lifo/bfs/dfs/random/opic, or 'focused' "
                    "(requires --focus-query)")
    ap.add_argument("--focus-query", default=None,
                    help="focused crawl: topic query scored against fetched captions")
    ap.add_argument("--focus-decay", type=float, default=0.5)
    ap.add_argument("--focus-gamma", type=float, default=0.5)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max-per-host", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--mode", default="global", choices=["global", "per_partition"])
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--content-dedup",
        action="store_true",
        help="mirror handling: drop links from pages whose body signature "
        "was already crawled at another URL",
    )
    ap.add_argument(
        "--dust-every",
        type=int,
        default=None,
        help="mine DUST parameter-irrelevance rules every N iterations and "
        "strip mined params from candidate links before scheduling",
    )
    ap.add_argument("--dust-min-support", type=int, default=2)
    ap.add_argument(
        "--alias-share",
        type=float,
        default=0.0,
        help="fraction of corpus child links emitted as ?sess= aliases "
        "(the DUST fixture; implies the server ignores 'sess')",
    )
    args = ap.parse_args()

    from frontera_spark.session import get_spark
    from frontera_spark.sources.corpus import url_of, write_corpus

    spark = get_spark("crawl_loop", master=args.master)
    corpus_path = os.path.join(args.workdir, "corpus")
    if not os.path.exists(corpus_path):
        write_corpus(
            spark, corpus_path, args.n_images, args.n_hosts, args.seed,
            alias_share=args.alias_share,
        )
    strategy_obj = None
    if args.strategy == "focused":
        from frontera_spark.core.strategies import FocusedStrategy

        if not args.focus_query:
            ap.error("--strategy focused requires --focus-query")
        strategy_obj = FocusedStrategy(
            query=args.focus_query, decay=args.focus_decay, gamma=args.focus_gamma
        )
    loop = CrawlLoop(
        spark,
        os.path.join(args.workdir, "engine"),
        corpus_path,
        corpus_seed=args.seed,
        strategy=args.strategy if strategy_obj is None else "bfs",
        strategy_obj=strategy_obj,
        batch_size=args.batch,
        max_per_host=args.max_per_host,
        n_partitions=args.partitions,
        mode=args.mode,
        content_dedup=args.content_dedup,
        dust=(
            {"every": args.dust_every, "min_support": args.dust_min_support}
            if args.dust_every
            else None
        ),
        server_ignores=("sess",) if args.alias_share > 0 else (),
    )
    if loop.engine.count() == 0:
        loop.add_seeds([url_of(0, args.n_hosts)])
    hist = loop.run(verbose=True)
    total = sum(m["n_fetched"] for m in hist)
    viol = sum(m.get("invariant_violations", 0) for m in hist)
    print(f"crawled {total} pages in {len(hist)} iterations; invariant violations: {viol}")
    spark.stop()


if __name__ == "__main__":
    main()
