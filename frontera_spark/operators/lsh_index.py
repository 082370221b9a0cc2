"""Persisted MinHash-LSH near-dup index (VERDICT r3 next-round #1).

The incremental near-dup lookup is the operation a training pipeline runs on
EVERY ingest batch; before this module the corpus side re-shingled and
re-banded raw text per call — O(corpus) work where O(batch) is achievable.
The index materializes the two corpus-side artifacts as SnapshotTables
(plans/snapshot.py — atomic manifests, COW partitions, partition-pruned
reads), so a probe touches only:

- the BATCH's text (shingled/banded fresh — it's new data), and
- the index tables' parquet: band keys partitioned by ``crc32(sig) %
  n_partitions`` so the (band, sig) equi-join reads ONLY the partitions the
  batch's signatures hash into (partition pruning at planning time), plus the
  candidate docs' shingle sets for exact-Jaccard verification.

No corpus text is ever scanned on the probe path (pinned by plan inspection
in tests/test_round4_fixes.py). ``accept()`` appends an admitted batch's rows
through the same MERGE machinery the frontier uses, so the index stays in
lockstep with the corpus version — at 10^10 docs the per-ingest dedup cost is
O(batch + matched index partitions), not O(corpus).

Layout under ``<path>/``:
- ``bands/``: (doc_id, band, sig, partition_id = crc32(sig) % P) — the LSH
  bucket keys; key (doc_id, band).
- ``sets/``:  (doc_id, sh array<string>, partition_id = doc_id % P) — the
  distinct shingle sets backing exact verification; key (doc_id).

Banding parameters live in the bands table's manifest meta — an index is
self-describing and reload-safe across sessions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frontera_spark.plans.snapshot import SnapshotTable


def _sig_pid(col, n_partitions: int):
    """Deterministic signature → partition bucket (crc32, matching the
    engine's host-partitioner convention)."""
    return F.pmod(F.crc32(F.encode(col, "utf-8")), F.lit(n_partitions)).cast("int")


class MinHashLshIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.bands_t = SnapshotTable.load(spark, os.path.join(path, "bands"))
        self.sets_t = SnapshotTable.load(spark, os.path.join(path, "sets"))
        meta = self.bands_t.manifest()["meta"]
        self.bands = int(meta["bands"])
        self.r = int(meta["r"])
        self.n_partitions = int(meta["n_partitions"])

    # ------------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        path: str,
        corpus: DataFrame,
        bands: int = 4,
        r: int = 3,
        n_partitions: int = 16,
    ) -> "MinHashLshIndex":
        """Materialize the index for a (doc_id, text) corpus — the
        once-per-corpus-version cost every later probe amortizes. The
        transient shingle frame is cached across its two consumers (band agg
        + set agg) and unpersisted before returning: nothing stays pinned."""
        from frontera_spark.operators.pipeline import _band_frame, _shingle_frame

        sh = _shingle_frame(corpus).cache()
        bands_df = _band_frame(sh, bands, r).select(
            "doc_id",
            F.col("band").cast("int").alias("band"),
            "sig",
            _sig_pid(F.col("sig"), n_partitions).alias("partition_id"),
        )
        sets_df = (
            sh.groupBy("doc_id")
            .agg(F.collect_list("s").alias("sh"))
            .select(
                "doc_id",
                "sh",
                F.pmod(F.col("doc_id"), F.lit(n_partitions)).cast("int").alias("partition_id"),
            )
        )
        tb = SnapshotTable.create(
            spark,
            os.path.join(path, "bands"),
            "doc_id bigint, band int, sig string, partition_id int",
            key=["doc_id", "band"],
        )
        tb.overwrite(
            bands_df, meta={"bands": bands, "r": r, "n_partitions": n_partitions}
        )
        ts = SnapshotTable.create(
            spark,
            os.path.join(path, "sets"),
            "doc_id bigint, sh array<string>, partition_id int",
            key=["doc_id"],
        )
        ts.overwrite(sets_df)
        sh.unpersist()
        return cls(spark, path)

    # ----------------------------------------------------------------- mutate

    def accept(self, batch: DataFrame) -> None:
        """Append an ADMITTED batch's band keys + shingle sets (the rows a
        probe decided are not near-dups): two batch-sized MERGEs — the index
        follows the corpus version without ever rescanning it."""
        from frontera_spark.operators.pipeline import _band_frame, _shingle_frame

        sh = _shingle_frame(batch).cache()
        self.bands_t.upsert(
            _band_frame(sh, self.bands, self.r).select(
                "doc_id",
                F.col("band").cast("int").alias("band"),
                "sig",
                _sig_pid(F.col("sig"), self.n_partitions).alias("partition_id"),
            )
        )
        self.sets_t.upsert(
            sh.groupBy("doc_id")
            .agg(F.collect_list("s").alias("sh"))
            .select(
                "doc_id",
                "sh",
                F.pmod(F.col("doc_id"), F.lit(self.n_partitions))
                .cast("int")
                .alias("partition_id"),
            )
        )
        sh.unpersist()

    # ------------------------------------------------------------------ query

    def probe(self, new_docs: DataFrame, jaccard_min: float = 0.6) -> DataFrame:
        """Which new docs near-duplicate the indexed corpus: (a = corpus
        doc_id, b = new doc_id, jaccard ≥ threshold). Shingles/bands are
        computed for the BATCH only; the corpus side is read from the index
        tables — band partitions pruned to the batch's signature buckets,
        shingle sets joined for the (few) candidates. Semantically identical
        to pipeline.minhash_lsh_lookup on the raw frames (pinned in tests).
        """
        from frontera_spark.operators.pipeline import (
            _band_frame,
            _jaccard_verify,
            _shingle_frame,
        )

        sh_n = _shingle_frame(new_docs)
        bands_n = _band_frame(sh_n, self.bands, self.r).withColumn(
            "partition_id", _sig_pid(F.col("sig"), self.n_partitions)
        )
        # batch-sized collect: which signature buckets can match at all —
        # the isin filter prunes index partitions at planning time
        pids = [
            r["partition_id"]
            for r in bands_n.select("partition_id").distinct().collect()
        ]
        idx = self.bands_t.read().filter(F.col("partition_id").isin(pids))
        cand = (
            idx.alias("x")
            .join(bands_n.alias("y"), ["band", "sig"])
            .filter(F.col("x.doc_id") != F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
            .distinct()
        )
        sets_c = self.sets_t.read().select("doc_id", "sh")
        sets_n = sh_n.groupBy("doc_id").agg(F.collect_list("s").alias("sh"))
        return _jaccard_verify(cand, sets_c, sets_n, jaccard_min)

    def pairs(self, jaccard_min: float = 0.6) -> DataFrame:
        """Within-corpus near-dup pairs (a < b) straight from the persisted
        index — the self-join path of minhash_lsh_pairs_for with zero cache
        pins: every frame is parquet-backed."""
        from frontera_spark.operators.pipeline import _jaccard_verify

        b = self.bands_t.read()
        cand = (
            b.alias("x")
            .join(b.alias("y"), ["band", "sig"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
            .distinct()
        )
        sets = self.sets_t.read().select("doc_id", "sh")
        return _jaccard_verify(cand, sets, sets, jaccard_min)
