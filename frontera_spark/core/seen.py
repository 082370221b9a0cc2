"""Partitioned bloom+cuckoo seen-set shards (SURVEY.md M6, north-rule item).

One (bloom, cuckoo) shard pair per frontier partition, stored as files under
``<workdir>/seen_shards/shard-<pid>.bin`` with a JSON manifest pinning the
seen-set generation (insert-commit counter) they are synced to. Both filters are **negative
pre-filters** in front of the exact anti-join (frontera's States store is
exact — SURVEY.md §1.2): the "maybe seen" verdict comes from the bloom
(strict superset of the seen set — no false negatives); the cuckoo is
advisory membership plus the delete path (it CAN under-contain after full
buckets or colliding deletes, so it never gates the verdict). "Definitely
new" rows skip the anti-join entirely — at 10^10-URL scale that removes the
shuffle for the (dominant) fresh fraction of every batch; "maybe" rows go
through the exact join, so a false positive can never drop a URL
(SURVEY.md §7.4.2). The cuckoo shard additionally supports deletes for
physical evictions (TTL purges), where a bloom would silently go stale.

Scale shape:
- **update** is distributed: candidates are grouped by partition_id and each
  ``applyInPandas`` task loads, extends, and atomically rewrites ONLY its
  shard file (single-writer loop ⇒ one task per shard per batch);
- **classify** is a ``mapInPandas`` over candidates — each task lazily loads
  the shard files its rows reference through a per-worker mtime-keyed cache;
- **crash safety**: shards are written before the frontier MERGE commits and
  the manifest is synced after, so shards are always a superset of the
  committed seen set; a manifest/table snapshot mismatch at load time
  triggers a distributed rebuild from the table.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from frontera_spark.functions.filters import BloomFilter, CuckooFilter

# per-executor-worker shard LRU: (path, mtime) -> (bloom, cuckoo). Bounded so
# long-lived workers don't accumulate stale generations; big enough that one
# worker can hold every shard of a job (classify batches interleave pids).
_SHARD_CACHE: dict = {}
_SHARD_CACHE_MAX = 128


def _shard_path(shard_dir: str, pid: int) -> str:
    return os.path.join(shard_dir, f"shard-{pid}.bin")


def _write_shard(path: str, bloom: BloomFilter, cuckoo: CuckooFilter | None) -> None:
    """``cuckoo=None`` writes a bloom-only shard (nc=0 in the header) — half
    to a third the bytes through write+fsync+read on every update cycle."""
    b = bloom.to_bytes()
    c = cuckoo.to_bytes() if cuckoo is not None else b""
    blob = np.array([len(b), len(c)], dtype=np.int64).tobytes() + b + c
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _read_shard(path: str, capacity: int) -> tuple[BloomFilter, CuckooFilter]:
    if not os.path.exists(path):
        return BloomFilter(capacity), CuckooFilter(capacity)
    with open(path, "rb") as f:
        blob = f.read()
    nb, nc = np.frombuffer(blob[:16], dtype=np.int64)
    bloom = BloomFilter.from_bytes(blob[16 : 16 + int(nb)])
    # nc == 0: bloom-only shard. The fresh empty cuckoo keeps the tuple
    # interface; it is advisory-only everywhere, so emptiness is safe even
    # if the same dir is later opened with bloom_only=False.
    if int(nc) == 0:
        return bloom, CuckooFilter(capacity)
    cuckoo = CuckooFilter.from_bytes(blob[16 + int(nb) : 16 + int(nb) + int(nc)])
    return bloom, cuckoo


def _cached_shard(path: str, capacity: int) -> tuple[BloomFilter, CuckooFilter]:
    # key on (mtime_ns, size), not mtime: two rewrites within one coarse
    # mtime tick must not serve a stale bloom (a false negative here would
    # bypass the anti-join and re-queue a committed fingerprint)
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except FileNotFoundError:
        key = (path, -1, -1)
    hit = _SHARD_CACHE.pop(key, None)
    if hit is None:
        hit = _read_shard(path, capacity)
    _SHARD_CACHE[key] = hit  # re-insert = move to MRU end (dicts are ordered)
    while len(_SHARD_CACHE) > _SHARD_CACHE_MAX:
        _SHARD_CACHE.pop(next(iter(_SHARD_CACHE)))
    return hit


class SeenShards:
    def __init__(self, workdir: str, capacity: int = 1 << 20, bloom_only: bool = False):
        """``capacity`` is PER SHARD and fixes each shard file's size (the
        bloom is 2 bytes/key of capacity whether or not it's full), which is
        also the per-update IO bill: every add rewrites + fsyncs the touched
        shard files and invalidates the per-worker cache, so every probe
        stage after an add re-reads them. Size it to expected keys ÷ shard
        count, not to a universal ceiling — overfilling only raises the
        bloom FP rate (more exact-join work for "maybe" rows), never
        correctness. ``bloom_only=True`` drops the cuckoo half (2/3 of the
        bytes) for key sets that never need the delete path."""
        self.shard_dir = os.path.join(workdir, "seen_shards")
        os.makedirs(self.shard_dir, exist_ok=True)
        self.capacity = capacity
        self.bloom_only = bloom_only
        self.manifest_path = os.path.join(self.shard_dir, "MANIFEST.json")
        self.last_cuckoo_failures = 0

    # ------------------------------------------------------------------ state

    def synced_gen(self) -> int:
        if not os.path.exists(self.manifest_path):
            return -1
        with open(self.manifest_path) as f:
            return json.load(f)["seen_gen"]

    def commit(self, seen_gen: int) -> None:
        tmp = f"{self.manifest_path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump({"seen_gen": seen_gen, "capacity": self.capacity}, f)
        os.replace(tmp, self.manifest_path)

    def stale(self, seen_gen: int) -> bool:
        return self.synced_gen() != seen_gen

    # ---------------------------------------------------------------- updates

    def add(self, fps: DataFrame, journal_dir: str | None = None) -> int:
        """Distributed shard update: df(partition_id, fingerprint) → each
        shard file extended and atomically replaced by its partition's task.
        Returns rows added.

        ``journal_dir`` fuses the exact-log write into the SAME job: each
        shard's task also writes its group's fingerprints as
        ``<journal_dir>/shard-<pid>.parquet`` (column ``sig``) before
        updating the filter — one Spark job where write-log + add-shards
        would be two, and the log lands in parallel per shard instead of
        through a coalesce(1) single task. Filenames are deterministic per
        shard, so task retries and rollback replays overwrite idempotently;
        the caller clears the directory first when replaying a shorter
        iteration set."""
        shard_dir, capacity = self.shard_dir, self.capacity
        bloom_only = self.bloom_only

        def update(pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(pdf["partition_id"].iloc[0])
            vals = pdf["fingerprint"].to_numpy(dtype=np.int64)
            if journal_dir is not None:
                import pyarrow as pa
                import pyarrow.parquet as pq

                pq.write_table(
                    pa.table({"sig": vals}),
                    os.path.join(journal_dir, f"shard-{pid}.parquet"),
                )
            path = _shard_path(shard_dir, pid)
            bloom, cuckoo = _read_shard(path, capacity)
            n_failed = 0
            if not bloom_only:
                # cuckoo holds each fingerprint once: skip ones already
                # present (a false positive here only weakens the pre-filter
                # for that fp, never correctness — the exact join still runs
                # for "maybe" rows)
                fresh = vals[~cuckoo.contains_many(vals)]
                n_failed = cuckoo.add_many(fresh)
            bloom.add_many(vals)
            _write_shard(path, bloom, None if bloom_only else cuckoo)
            # n_failed > 0 ⇒ the cuckoo shard is over capacity and is now
            # missing fingerprints — membership in it is advisory-only (the
            # bloom remains a strict superset; see classify())
            return pd.DataFrame(
                {"partition_id": [pid], "n": [len(vals)], "n_cuckoo_failed": [n_failed]}
            )

        out = (
            fps.select("partition_id", "fingerprint")
            .groupBy("partition_id")
            .applyInPandas(update, "partition_id int, n long, n_cuckoo_failed long")
        ).collect()
        self.last_cuckoo_failures = int(sum(r["n_cuckoo_failed"] for r in out))
        return sum(r["n"] for r in out)

    def rebuild(self, table: DataFrame) -> int:
        """Full distributed rebuild from the frontier table (stale recovery)."""
        for f in os.listdir(self.shard_dir):
            if f.startswith("shard-"):
                os.unlink(os.path.join(self.shard_dir, f))
        return self.add(table.select("partition_id", "fingerprint"))

    def delete(self, fps: DataFrame) -> int:
        """Remove fingerprints from the cuckoo shards (physical evictions —
        TTL purges). Blooms can't delete; they stay supersets until the next
        rebuild, which only costs extra exact-join work, never correctness."""
        if self.bloom_only:
            raise RuntimeError("bloom-only shard set has no delete path")
        shard_dir, capacity = self.shard_dir, self.capacity

        def drop(pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(pdf["partition_id"].iloc[0])
            path = _shard_path(shard_dir, pid)
            bloom, cuckoo = _read_shard(path, capacity)
            n = cuckoo.delete_many(pdf["fingerprint"].to_numpy(dtype=np.int64))
            _write_shard(path, bloom, cuckoo)
            return pd.DataFrame({"partition_id": [pid], "n": [n]})

        out = (
            fps.select("partition_id", "fingerprint")
            .groupBy("partition_id")
            .applyInPandas(drop, "partition_id int, n long")
        )
        return sum(r["n"] for r in out.collect())

    # --------------------------------------------------------------- classify

    def maybe_seen(self, probe: DataFrame) -> DataFrame:
        """df(partition_id, fingerprint) → the (fingerprint) subset that is
        MAYBE in the seen set.

        Narrow on purpose (12 bytes/row through Arrow — shipping full
        candidate rows costs ~10× the probe itself) and repartitioned by
        partition_id first, so each task loads exactly ONE shard instead of
        every worker paging in all P of them. Bloom-only probe: at 16
        bits/key its FP ≈ 0.06%, so the cuckoo intersection would shave a
        negligible remainder for double the probe cost — the cuckoo shard
        earns its keep on the delete path instead."""
        shard_dir, capacity = self.shard_dir, self.capacity

        def probe_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                keep = np.zeros(len(pdf), dtype=bool)
                for pid, grp in pdf.groupby("partition_id"):
                    bloom, _cuckoo = _cached_shard(_shard_path(shard_dir, int(pid)), capacity)
                    vals = grp["fingerprint"].to_numpy(dtype=np.int64)
                    keep[grp.index] = bloom.contains_many(vals)
                yield pdf.loc[keep, ["fingerprint"]]

        return (
            probe.select("partition_id", "fingerprint")
            .repartition("partition_id")
            .mapInPandas(probe_fn, "fingerprint long")
        )

    def maybe_seen_udf(self):
        """Inline bloom probe: scalar pandas UDF ``(partition_id, fingerprint)
        → boolean`` (True = MAYBE seen, False = definitely new).

        Unlike :meth:`maybe_seen`, this runs inside whatever partitioning the
        caller already has — no ``repartition("partition_id")`` shuffle. That
        matters twice at scale: (1) ``partition_id`` has only P distinct
        values, so hash-repartitioning on it leaves ~1/e of P shuffle
        partitions empty — idling that fraction of the cores exactly when the
        probe is the hot phase (measured: the dedup stage's 8→32-core scaling
        ceiling); (2) only the two probe columns cross Arrow, the wide
        candidate row never leaves the JVM, so no re-join is needed to map
        verdicts back to rows. The trade is that a worker may page in several
        shards instead of exactly one; the (path, mtime_ns, size)-keyed LRU
        in ``_cached_shard`` absorbs the repeats within a worker."""
        from pyspark.sql.functions import pandas_udf

        shard_dir, capacity = self.shard_dir, self.capacity

        @pandas_udf("boolean")
        def probe(pid: pd.Series, fp: pd.Series) -> pd.Series:
            out = np.zeros(len(fp), dtype=bool)
            pids = pid.to_numpy()
            fps = fp.to_numpy(dtype=np.int64)
            for p in np.unique(pids):
                m = pids == p
                bloom, _cuckoo = _cached_shard(_shard_path(shard_dir, int(p)), capacity)
                out[m] = bloom.contains_many(fps[m])
            return pd.Series(out)

        return probe

    def classify(self, candidates: DataFrame) -> DataFrame:
        """Append ``_maybe_seen boolean``: False ⇒ definitely NOT in the seen
        set (skip the exact anti-join); True ⇒ check exactly.

        The verdict comes from the BLOOM alone: blooms have no false
        negatives, so "not in bloom" is a safe definitely-new. The cuckoo can
        have false negatives (add() skips fingerprints the cuckoo already
        claims via a false positive, add_many() drops items when a bucket
        chain is full, delete_many() can evict a colliding tag), so ANDing it
        in would make the False verdict unsafe — cuckoo membership is
        advisory (it earns its keep on the delete path)."""
        from pyspark.sql.types import BooleanType, StructField, StructType

        shard_dir, capacity = self.shard_dir, self.capacity
        # fresh StructType: .add() would mutate the DataFrame's cached schema
        # object in place and desync it from the analyzed plan
        schema = StructType(
            list(candidates.schema.fields) + [StructField("_maybe_seen", BooleanType())]
        )

        def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                maybe = np.zeros(len(pdf), dtype=bool)
                for pid, grp in pdf.groupby("partition_id"):
                    bloom, _cuckoo = _cached_shard(_shard_path(shard_dir, int(pid)), capacity)
                    vals = grp["fingerprint"].to_numpy(dtype=np.int64)
                    maybe[grp.index] = bloom.contains_many(vals)
                out = pdf.copy()
                out["_maybe_seen"] = maybe
                yield out

        return candidates.mapInPandas(probe, schema)
