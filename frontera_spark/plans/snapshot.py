"""Snapshot table layer: Iceberg-shaped atomic MERGE/commit over Parquet.

No Iceberg runtime jar is available offline (SURVEY.md §7.0), so this module
provides the same semantics the engine needs from `MERGE INTO` + snapshots:

- **Copy-on-write at partition granularity.** Data lives in immutable parquet
  leaf dirs ``data/snap-<id>/partition_id=<p>/``. A merge rewrites ONLY the
  hash-partitions its source touches and re-links every other partition's
  existing files into the new manifest. At 100 TB this is the property that
  matters: a 10k-row score update against a 10^10-row frontier rewrites a few
  partitions, not the table.
- **Atomic commit.** A snapshot is a JSON manifest (snapshot id, parent id,
  per-partition file dirs, per-partition row counters = lineage) written to a
  tmp file then ``os.replace``d over ``CURRENT``. Readers see the old or the
  new snapshot, never a mix. Resume = read CURRENT (or any retained manifest).
- **Partition pruning preserved.** Reads go through
  ``spark.read.option("basePath", ...)`` so ``partition_id`` stays a partition
  column and filters on it prune leaf dirs at planning time.

The interface is deliberately Iceberg-shaped (`upsert` == ``MERGE INTO t USING
s ON key WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``) so a
real `iceberg-spark-runtime` catalog can replace this layer without touching
engine code. Reference parity: frontera persists the same state in SQLAlchemy/
HBase tables with batched mutations (frontera/contrib/backends/sqlalchemy/
components.py:~120-240, hbase/__init__.py:~250-420); snapshots replace its
at-least-once + job-id fencing with exactly-once resume.

Single-writer by design (the crawl loop is the only mutator), like frontera's
DB worker.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "partition_id"


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._data_root = os.path.join(path, "data")

    # ------------------------------------------------------------- lifecycle

    @classmethod
    def create(cls, spark: SparkSession, path: str, schema_ddl: str, key: list[str]) -> "SnapshotTable":
        """Create an empty table. ``schema_ddl`` must include partition_id int."""
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        t = cls(spark, path)
        manifest = {
            "snapshot_id": 0,
            "parent_id": None,
            "schema": schema_ddl,
            "key": key,
            "dirs": {},       # partition_id (str) -> [relative leaf dirs]
            "counters": {},   # partition_id (str) -> row count (lineage)
            "meta": {},       # free-form engine counters (next_seq, iteration, ...)
            "committed_at": time.time(),
        }
        t._write_manifest(manifest)
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SnapshotTable":
        t = cls(spark, path)
        t.manifest()  # validates existence
        return t

    def manifest(self, snapshot_id: int | None = None) -> dict:
        name = "CURRENT" if snapshot_id is None else f"manifest-{snapshot_id}.json"
        with open(os.path.join(self.path, name)) as f:
            return json.load(f)

    @property
    def snapshot_id(self) -> int:
        return self.manifest()["snapshot_id"]

    def _write_manifest(self, manifest: dict) -> None:
        """Write manifest-<id>.json and atomically swing CURRENT to it."""
        sid = manifest["snapshot_id"]
        mpath = os.path.join(self.path, f"manifest-{sid}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        tmp = os.path.join(self.path, f".CURRENT.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.path, "CURRENT"))  # atomic commit point

    def rollback(self, snapshot_id: int) -> None:
        """Point CURRENT back at an earlier retained snapshot (resume)."""
        m = self.manifest(snapshot_id)
        tmp = os.path.join(self.path, f".CURRENT.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, os.path.join(self.path, "CURRENT"))

    # ------------------------------------------------------------------ read

    def _read_leaf_dirs(self, dirs: list[str]) -> DataFrame | None:
        """Union-read a set of relative leaf dirs, grouped by snapshot root so
        each root is one partitioned-table read (its own basePath →
        partition_id recovered + pruned). Filters on partition_id push
        through the union into every branch's PartitionFilters."""
        if not dirs:
            return None
        by_root: dict[str, list[str]] = {}
        for d in sorted(set(dirs)):
            root = d.split("/", 1)[0]
            by_root.setdefault(root, []).append(d)
        parts = []
        for root, ds in by_root.items():
            base = os.path.join(self._data_root, root)
            paths = [os.path.join(self._data_root, d) for d in ds]
            parts.append(self.spark.read.option("basePath", base).parquet(*paths))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def read(self, snapshot_id: int | None = None, with_marks: bool = True) -> DataFrame:
        m = self.manifest(snapshot_id)
        base = self._read_leaf_dirs([d for ds in m["dirs"].values() for d in ds])
        if base is None:
            return self.spark.createDataFrame([], m["schema"])
        marks = m.get("marks", {})
        if not with_marks or not marks:
            return base
        # merge-on-read overlay (add_marks): latest mark per key overrides the
        # base values of mark_cols. The overlay is bounded by in-flight
        # batches plus the compaction window (every COW commit absorbs-and-
        # drops its partitions' marks, and compact() folds any that outlive
        # one), so the build side broadcasts — the base never shuffles here.
        # Base columns OUTSIDE mark_cols stay scan-accurate, so their filters
        # still push down to parquet; mark_cols filters evaluate post-join.
        # overlay keyed on (key, partition_id), not the manifest key alone:
        # add_marks records partition_id, and nothing in its generic API
        # guarantees a key value exists in only one partition — keying on the
        # full pair means a duplicate key in two partitions can never have one
        # partition's mark override both rows
        key = m["key"] + [PARTITION_COL]
        mark_cols = m["mark_cols"]
        mk = self._read_leaf_dirs([d for ds in marks.values() for d in ds])
        latest = (
            mk.groupBy(*key)
            .agg(F.max_by(F.struct(*mark_cols), F.col("_mseq")).alias("_mk"))
            .withColumn("_mhit", F.lit(True))
        )
        joined = base.join(F.broadcast(latest), key, "left")
        sel = [
            F.when(F.col("_mhit"), F.col(f"_mk.{c}")).otherwise(F.col(c)).alias(c)
            if c in mark_cols
            else F.col(c)
            for c in base.columns
        ]
        return joined.select(*sel)

    def counters(self, snapshot_id: int | None = None) -> dict:
        return self.manifest(snapshot_id)["counters"]

    def read_mark_keys(self) -> DataFrame | None:
        """Distinct (key, partition_id) of every LIVE overlay mark, or None
        when no marks are live. Bounded by in-flight batches (COW commits
        absorb their partitions' marks), so callers can broadcast it.

        This is the pushdown-preserving complement to ``read()``: a scan that
        only needs "rows NOT currently marked" can filter the BASE table
        (where every predicate still reaches parquet) and anti-join this key
        set, instead of filtering above the overlay join where nothing pushes
        down."""
        m = self.manifest()
        marks = m.get("marks", {})
        if not marks:
            return None
        mk = self._read_leaf_dirs([d for ds in marks.values() for d in ds])
        return mk.select(*m["key"], PARTITION_COL).distinct()

    # ----------------------------------------------------------------- write

    def _write_partitions(self, df: DataFrame, sid: int) -> tuple[dict, dict]:
        """Write df (must carry partition_id) as one snapshot leaf-dir set.

        Returns ({pid: [reldir]}, {pid: count}). One Spark write job; files
        land partitioned by partition_id so reads prune. The lineage counters
        are read back from the written files' parquet footers (metadata-only
        count) instead of recomputing the merge plan a second time.
        """
        rel = f"snap-{sid}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self._data_root, rel)
        (
            df.repartition(PARTITION_COL)
            .write.mode("overwrite")
            .partitionBy(PARTITION_COL)
            .parquet(out)
        )
        # an empty result writes only _SUCCESS (no partition_id=* leaf dirs);
        # reading that back would fail schema inference — and an empty merge
        # legitimately happens (delete_where matching whole partitions,
        # insert=False upsert against an empty target): the affected
        # partitions are then cleanly dropped by _commit
        if not any(e.startswith(f"{PARTITION_COL}=") for e in os.listdir(out)):
            return {}, {}
        # driver-side parquet-footer reads (pyarrow metadata only, no row
        # groups): the counters come straight from what the write job
        # produced, without paying a second Spark job per commit — at 3
        # merges per crawl iteration that job was pure fixed cost. The same
        # footer reads work against object storage on a cluster (what
        # Iceberg-style manifests record at commit time).
        import pyarrow.parquet as pq

        counts: dict[str, int] = {}
        for entry in os.listdir(out):
            if not entry.startswith(f"{PARTITION_COL}="):
                continue
            pid = entry.split("=", 1)[1]
            leaf = os.path.join(out, entry)
            counts[pid] = sum(
                pq.ParquetFile(os.path.join(leaf, f)).metadata.num_rows
                for f in os.listdir(leaf)
                if f.endswith(".parquet")
            )
        dirs = {
            pid: [f"{rel}/{PARTITION_COL}={pid}"]
            for pid in counts
        }
        return dirs, counts

    def _commit(self, new_dirs: dict, new_counts: dict, affected: set[str], meta: dict | None) -> int:
        prev = self.manifest()
        sid = prev["snapshot_id"] + 1
        dirs = {p: ds for p, ds in prev["dirs"].items() if p not in affected}
        counters = {p: c for p, c in prev["counters"].items() if p not in affected}
        dirs.update(new_dirs)
        counters.update(new_counts)
        # a COW rewrite reads through the mark overlay (read() applies it), so
        # the rewritten partitions have the marks baked in — drop them
        marks = {
            p: ds for p, ds in prev.get("marks", {}).items() if p not in affected
        }
        manifest = {
            "snapshot_id": sid,
            "parent_id": prev["snapshot_id"],
            "schema": prev["schema"],
            "key": prev["key"],
            "dirs": dirs,
            "counters": counters,
            "marks": marks,
            "mark_cols": prev.get("mark_cols"),
            "meta": {**prev.get("meta", {}), **(meta or {})},
            "committed_at": time.time(),
        }
        self._write_manifest(manifest)
        return sid

    # ------------------------------------------------- merge-on-read marks

    # below this row count, add_marks collects the (narrow) mark rows and
    # writes the overlay leafs driver-side with pyarrow — a steady-state pop
    # marks a few thousand rows, and the Spark shuffle + partitioned-write
    # commit protocol costs more than moving ~3 long columns to the driver
    SMALL_MARK_ROWS = 1 << 16

    def add_marks(
        self,
        src: DataFrame,
        mark_cols: list[str],
        meta: dict | None = None,
        n_rows: int | None = None,
    ) -> int:
        """Merge-on-read UPDATE: record a (key → mark_cols) overlay for
        EXISTING rows without rewriting any data partition. ``read()``
        applies latest-mark-wins; any COW commit absorbs and drops its
        partitions' marks. This is what makes a destructive pop O(batch):
        marking 64k popped rows appends a 64k-row delta instead of
        rewriting every touched 10^8-row partition (Iceberg v2
        merge-on-read delete/update files have the same shape).

        An empty ``src`` still commits a snapshot (meta-only — the crawl
        clock advances even when nothing was servable).

        ``n_rows`` (when the caller already counted the batch) routes small
        batches through a driver-side pyarrow write: same
        ``marks-<sid>/partition_id=<p>/`` leaf layout, same schema, but one
        narrow collect instead of a shuffle + partitioned-write commit
        protocol. Large/unknown batches keep the distributed write."""
        m = self.manifest()
        prev_cols = m.get("mark_cols")
        if prev_cols and set(prev_cols) != set(mark_cols):
            raise ValueError(f"mark_cols {mark_cols} != table's {prev_cols}")
        sid = m["snapshot_id"] + 1
        rel = f"marks-{sid}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self._data_root, rel)
        cols = m["key"] + [PARTITION_COL] + list(mark_cols)
        marks = {p: list(ds) for p, ds in m.get("marks", {}).items()}
        if n_rows is not None and n_rows <= self.SMALL_MARK_ROWS:
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            tbl = src.select(*cols).withColumn("_mseq", F.lit(sid).cast("long")).toArrow()
            for pid in pc.unique(tbl[PARTITION_COL]).to_pylist():
                # Spark's partitioned layout: the partition column lives in
                # the dir name only, not in the file
                sub = tbl.filter(pc.equal(tbl[PARTITION_COL], pid)).drop_columns(
                    [PARTITION_COL]
                )
                leaf_rel = f"{rel}/{PARTITION_COL}={pid}"
                leaf = os.path.join(self._data_root, leaf_rel)
                os.makedirs(leaf, exist_ok=True)
                tmp = os.path.join(leaf, "_tmp.parquet")
                pq.write_table(sub, tmp)
                os.replace(tmp, os.path.join(leaf, "part-0.parquet"))
                marks.setdefault(str(pid), []).append(leaf_rel)
        else:
            (
                src.select(*cols)
                .withColumn("_mseq", F.lit(sid).cast("long"))
                .repartition(PARTITION_COL)
                .write.mode("overwrite")
                .partitionBy(PARTITION_COL)
                .parquet(out)
            )
            for entry in os.listdir(out):
                if entry.startswith(f"{PARTITION_COL}="):
                    pid = entry.split("=", 1)[1]
                    marks.setdefault(pid, []).append(f"{rel}/{entry}")
        manifest = {
            **m,
            "snapshot_id": sid,
            "parent_id": m["snapshot_id"],
            "marks": marks,
            "mark_cols": list(mark_cols),
            "meta": {**m.get("meta", {}), **(meta or {})},
            "committed_at": time.time(),
        }
        self._write_manifest(manifest)
        return sid

    def clear_marks(self, meta: dict | None = None) -> int:
        """Drop every live mark (metadata-only commit). Crash recovery for
        in-flight feed batches: un-absorbed marks are by definition marks
        whose results never committed, so clearing them re-queues exactly
        the in-flight rows — no data rewrite."""
        m = self.manifest()
        if not m.get("marks") and not meta:
            return m["snapshot_id"]
        manifest = {
            **m,
            "snapshot_id": m["snapshot_id"] + 1,
            "parent_id": m["snapshot_id"],
            "marks": {},
            "meta": {**m.get("meta", {}), **(meta or {})},
            "committed_at": time.time(),
        }
        self._write_manifest(manifest)
        return manifest["snapshot_id"]

    def overwrite(self, df: DataFrame, meta: dict | None = None) -> int:
        """Replace the whole table (bulk loads)."""
        prev = self.manifest()
        sid = prev["snapshot_id"] + 1
        new_dirs, new_counts = self._write_partitions(df, sid)
        affected = set(prev["dirs"]) | set(new_dirs)
        return self._commit(new_dirs, new_counts, affected, meta)

    def _merged_frame(
        self,
        source: DataFrame,
        set_cols: list[str] | None,
        insert: bool,
        affected: set[str],
        m: dict,
        no_insert_col: str | None = None,
        add_cols: list[str] | None = None,
    ) -> DataFrame:
        """Build the MERGE result frame (exposed so tests can audit the
        executed plan — the broadcastability of the merge is a load-bearing
        scale property, asserted in test_snapshot).

        ``no_insert_col``: name of a boolean source column; rows flagged true
        are update-only — they can match (and set ``set_cols``) but are
        EXCLUDED from the insert branch, so an unknown-key update row drops
        instead of landing as a null-padded insert. The column itself never
        reaches the table.

        ``add_cols``: accumulator columns — matched rows get ``t.c + s.c``
        instead of ``s.c`` (Iceberg's ``UPDATE SET t.c = t.c + s.c`` merge
        clause; the OPIC cash ledger rides on this). The accumulator flavor
        changes the null contract for the WHOLE source: a NULL source value
        in an add_col OR a set_col means "leave the target value alone", so
        one source frame can carry heterogeneous updates (state transitions
        with no cash, cash with no state transition) without clobbering.
        Plain merges (``add_cols=None``) keep set-to-NULL semantics —
        revisit/recover legitimately null out batch_id."""
        key = m["key"]
        target = self.read()
        cols = target.columns
        add_cols = add_cols or []
        if set_cols is None:
            set_cols = [
                c
                for c in cols
                if c not in key and c != PARTITION_COL and c not in add_cols
            ]
        extra = [no_insert_col] if no_insert_col else []
        if insert or set(cols) <= set(source.columns):
            src = source.select(*cols, *extra)
        else:
            # narrow UPDATE-only source: the merge projection below reads
            # nothing from the source beyond key + set_cols, so an update
            # batch may arrive as just those columns — no caller-side
            # reconstruction join against the (10^10-row) target to widen it
            need = list(
                dict.fromkeys(
                    key + [c for c in [*set_cols, *add_cols] if c != PARTITION_COL]
                )
            )
            missing = [c for c in need if c not in source.columns]
            if missing:
                raise ValueError(
                    f"update source missing {missing}; needs key {key} + set_cols {set_cols}"
                )
            src = source.select(*need)

        # MERGE fast path: the affected target partitions hold zero rows
        # (manifest counters — metadata only). Every source row is an insert;
        # bulk loads into fresh partitions skip the join entirely (Iceberg's
        # merge-into-empty == append).
        tgt_rows = sum(int(m["counters"].get(p, 0)) for p in affected)
        if tgt_rows == 0:
            # update against empty partitions matches nothing — full-schema
            # empty frame (a narrow src would miss partition_id downstream)
            if not insert:
                return target.limit(0)
            if no_insert_col:
                # flagged update rows match nothing here and must NOT insert
                return src.filter(~F.col(no_insert_col)).select(*cols)
            return src

        tgt = target.filter(F.col(PARTITION_COL).isin([int(p) for p in affected]))
        t, s = tgt.alias("t"), src.alias("s")
        cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key]
        matched_s = F.col(f"s.{key[0]}").isNotNull()
        # decomposed MERGE: (target LEFT JOIN source) ∪ (source ANTI
        # target). Equivalent to the textbook full_outer formulation, but
        # both joins can BROADCAST the source — a batch-sized merge
        # against a 10^10-row table never shuffles the table, where a
        # full_outer join can never use a broadcast build side.
        proj = []
        for c in cols:
            tc, sc = F.col(f"t.{c}"), F.col(f"s.{c}")
            if c in key or c == PARTITION_COL:
                proj.append(tc.alias(c))
            elif c in add_cols:
                # accumulate: coalesce covers a NULL target (insert-then-add
                # races can't happen single-writer, but a null-scored row
                # should still absorb cash rather than poison the sum)
                proj.append(
                    F.when(
                        matched_s & sc.isNotNull(), F.coalesce(tc + sc, sc)
                    )
                    .otherwise(tc)
                    .alias(c)
                )
            elif c in set_cols:
                if add_cols:
                    # accumulator merges null-guard sets too (see docstring)
                    proj.append(
                        F.when(matched_s & sc.isNotNull(), sc).otherwise(tc).alias(c)
                    )
                else:
                    proj.append(F.when(matched_s, sc).otherwise(tc).alias(c))
            else:
                proj.append(tc.alias(c))
        # no explicit broadcast hint: AQE converts either join to a
        # broadcast build at runtime when the source side is small; a
        # bulk-sized source stays sort-merge (column-pruned to keys on
        # the anti side)
        kept = t.join(s, cond, "left").select(*proj)
        merged = kept
        if insert:
            ins_src = s.filter(~F.col(f"s.{no_insert_col}")) if no_insert_col else s
            inserts = ins_src.join(t, cond, "left_anti").select(
                *[F.col(f"s.{c}").alias(c) for c in cols]
            )
            merged = kept.unionByName(inserts)
        return merged

    def upsert(
        self,
        source: DataFrame,
        set_cols: list[str] | None = None,
        insert: bool = True,
        meta: dict | None = None,
        affected_pids: list[int] | None = None,
        no_insert_col: str | None = None,
        add_cols: list[str] | None = None,
    ) -> int:
        """MERGE INTO this USING source ON key.

        WHEN MATCHED: update ``set_cols`` (default: all non-key columns) from
        source, and accumulate ``add_cols`` as ``t.c + s.c`` (NULL source
        values leave the target untouched in accumulator mode — see
        _merged_frame). WHEN NOT MATCHED: insert source row (if ``insert``);
        rows whose boolean ``no_insert_col`` is true are update-only and
        never insert (see _merged_frame).

        Only partitions present in ``source`` are rewritten; the rest of the
        table is re-linked. Source MUST carry partition_id consistent with the
        table's partitioning function. Callers that already know the touched
        partitions pass ``affected_pids`` to skip the probe job (every Spark
        action here re-plans the source pipeline; fewer actions = the dominant
        micro-batch cost at any scale).
        """
        m = self.manifest()
        key = m["key"]
        sid = m["snapshot_id"] + 1
        cached = False
        if affected_pids is not None:
            affected = {str(p) for p in affected_pids}
        else:
            # the probe is a second consumer of the source plan — cache it so
            # the upstream (UDFs, anti-joins) doesn't recompute for the merge
            source = source.cache()
            cached = True
            affected = {
                str(r[PARTITION_COL])
                for r in source.select(PARTITION_COL).distinct().collect()
            }
        if not affected:
            if cached:
                source.unpersist()
            return m["snapshot_id"]  # empty merge: no-op, no new snapshot

        # the decomposed merge (left + anti) consumes the source twice; cache
        # it for the join path so the upstream plan (UDFs, anti-joins) runs
        # once. The append fast path has a single consumer — caching there
        # would only add a materialization pass.
        takes_join_path = (
            sum(int(m["counters"].get(p, 0)) for p in affected) > 0
        )
        if takes_join_path and not cached:
            source = source.cache()
            cached = True
        merged = self._merged_frame(
            source,
            set_cols,
            insert,
            affected,
            m,
            no_insert_col=no_insert_col,
            add_cols=add_cols,
        )
        new_dirs, new_counts = self._write_partitions(merged, sid)
        if cached:
            source.unpersist()
        # partitions that became empty still count as affected (dropped)
        return self._commit(new_dirs, new_counts, affected, meta)

    def append(self, source: DataFrame, meta: dict | None = None) -> int:
        """Fast append (Iceberg's append snapshot): commit ``source`` as NEW
        leaf dirs EXTENDING each touched partition's dir list — one O(batch)
        write job + a manifest swap. The target is never read, joined, or
        rewritten, so an insert-only commit against a 10^10-row table costs
        the same as against an empty one (upsert's COW join path rewrites
        every affected partition — O(partition) per touched partition).

        PRECONDITION: the caller guarantees ``source`` keys are absent from
        the table (the frontier anti-joins candidates against the seen set
        before scheduling). Appending an existing key produces a duplicate —
        exactly Iceberg's fast-append contract, where uniqueness lives above
        the table layer.

        Appends accumulate leaf dirs per partition; ``compact()`` is the
        maintenance companion that folds them back to one dir per partition.
        Live marks are untouched (appended rows are new keys — no mark can
        reference them)."""
        m = self.manifest()
        sid = m["snapshot_id"] + 1
        new_dirs, new_counts = self._write_partitions(source, sid)
        if not new_dirs and meta is None:
            return m["snapshot_id"]  # empty append: no-op, no new snapshot
        dirs = {p: list(ds) for p, ds in m["dirs"].items()}
        counters = {p: int(c) for p, c in m["counters"].items()}
        for p, ds in new_dirs.items():
            dirs[p] = dirs.get(p, []) + ds
            counters[p] = counters.get(p, 0) + int(new_counts[p])
        manifest = {
            **m,
            "snapshot_id": sid,
            "parent_id": m["snapshot_id"],
            "dirs": dirs,
            "counters": counters,
            "meta": {**m.get("meta", {}), **(meta or {})},
            "committed_at": time.time(),
        }
        self._write_manifest(manifest)
        return sid

    def compact(
        self, max_dirs: int = 4, max_mark_dirs: int = 4, meta: dict | None = None
    ) -> int:
        """Fold partitions whose leaf-dir count exceeds ``max_dirs`` (append
        accumulation) or whose live-mark-dir count exceeds ``max_mark_dirs``
        (merge-on-read accumulation) back to ONE leaf dir each, absorbing
        their marks — Iceberg/Delta's rewrite_data_files maintenance action.
        The decision is metadata-only (manifest dir counts); the rewrite
        reads through the mark overlay so the result is bit-identical to
        ``read()`` before the call. Untouched partitions are re-linked.
        Returns the new snapshot id (current id if nothing qualifies)."""
        m = self.manifest()
        heavy = {p for p, ds in m["dirs"].items() if len(ds) > max_dirs}
        heavy |= {
            p for p, ds in m.get("marks", {}).items() if len(ds) > max_mark_dirs
        }
        if not heavy:
            return m["snapshot_id"]
        df = self.read().filter(
            F.col(PARTITION_COL).isin([int(p) for p in heavy])
        )
        sid = m["snapshot_id"] + 1
        new_dirs, new_counts = self._write_partitions(df, sid)
        return self._commit(new_dirs, new_counts, heavy, meta)

    def maintenance_stats(self) -> dict:
        """Metadata-only observables a maintenance policy keys on: max/total
        leaf dirs per partition and live mark dirs (zero Spark jobs)."""
        m = self.manifest()
        dir_counts = [len(ds) for ds in m["dirs"].values()] or [0]
        mark_counts = [len(ds) for ds in m.get("marks", {}).values()] or [0]
        return {
            "max_dirs": max(dir_counts),
            "total_dirs": sum(dir_counts),
            "max_mark_dirs": max(mark_counts),
            "total_mark_dirs": sum(mark_counts),
        }

    def delete_where(self, condition, meta: dict | None = None) -> int:
        """Delete rows matching condition (rewrites affected partitions)."""
        target = self.read()
        doomed_pids = {
            str(r[PARTITION_COL])
            for r in target.filter(condition).select(PARTITION_COL).distinct().collect()
        }
        if not doomed_pids:
            return self.snapshot_id
        m = self.manifest()
        sid = m["snapshot_id"] + 1
        keep = target.filter(
            F.col(PARTITION_COL).isin([int(p) for p in doomed_pids]) & ~condition
        )
        new_dirs, new_counts = self._write_partitions(keep, sid)
        return self._commit(new_dirs, new_counts, doomed_pids, meta)

    def vacuum(self, keep_last: int = 10) -> None:
        """Drop data dirs unreachable from the last ``keep_last`` snapshots."""
        sid = self.snapshot_id
        live: set[str] = set()
        kept_ids = []
        for s in range(max(0, sid - keep_last + 1), sid + 1):
            try:
                m = self.manifest(s)
            except FileNotFoundError:
                continue
            kept_ids.append(s)
            for ds in m["dirs"].values():
                live.update(d.split("/")[0] for d in ds)
            # overlay mark dirs are live while any kept manifest references
            # them; absorbed marks age out of manifests but their files don't
            # delete themselves — reclaim them here like snap dirs
            for ds in m.get("marks", {}).values():
                live.update(d.split("/")[0] for d in ds)
        for entry in os.listdir(self._data_root):
            if (
                entry.startswith("snap-") or entry.startswith("marks-")
            ) and entry not in live:
                import shutil

                shutil.rmtree(os.path.join(self._data_root, entry), ignore_errors=True)
        for f in os.listdir(self.path):
            if f.startswith("manifest-"):
                s = int(f[len("manifest-") : -len(".json")])
                if s not in kept_ids and s != sid:
                    os.unlink(os.path.join(self.path, f))
