"""Persisted IVF (inverted-file) ANN index (VERDICT r3 next-round #2).

r3's IVF queries trained centroids and assigned every vector per call —
nothing was stored, so each query re-scanned and re-assigned the corpus. The
index persists the assignment as a SnapshotTable PARTITIONED BY CELL
(partition_id == cell id), with the trained centroids in the manifest meta:

- a top-k probe reads ONLY the ``nprobe`` nearest cells' partitions —
  partition pruning at planning time (~nprobe/k of the data files at any
  corpus size; pinned by inputFiles inspection in tests/test_round4_fixes.py);
- per-cell population (`ivf_cells`) comes straight from the manifest's
  lineage counters — a metadata-only read, zero Spark jobs;
- appended vectors assign incrementally against the stored centroids
  (one narrow argmax projection + a batch-sized MERGE).

Training is the caller's choice and stays out of this class: the bounded
sample trainer (operators/driver_queries._ivf_train — DuckDB-replayable) or
the fully distributed pipeline.kmeans_fit for the 10^10-vector regime. Both
share the HALF_UP-1e-4 rounded-dot assignment contract (pipeline.
kmeans_assign), so index contents are engine-independent.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frontera_spark.plans.snapshot import SnapshotTable


def _round4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


class IvfIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.table = SnapshotTable.load(spark, path)
        self.centroids: list[list[float]] = [
            [float(x) for x in c] for c in self.table.manifest()["meta"]["centroids"]
        ]

    # ------------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        path: str,
        vecs: DataFrame,
        centroids: list[list[float]],
        id_col: str = "vec_id",
        vec_col: str = "v",
    ) -> "IvfIndex":
        """Materialize (vec_id, v, partition_id=cell) for trained centroids.
        One narrow argmax projection + one partitioned write; the corpus
        never reaches the driver."""
        from frontera_spark.operators.pipeline import kmeans_assign

        asgn = kmeans_assign(vecs, centroids, id_col=id_col, vec_col=vec_col)
        df = (
            vecs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
            .join(asgn.select(F.col(id_col).alias("vec_id"), "cell"), "vec_id")
            .select("vec_id", "v", F.col("cell").cast("int").alias("partition_id"))
        )
        t = SnapshotTable.create(
            spark, path, "vec_id bigint, v array<double>, partition_id int",
            key=["vec_id"],
        )
        t.overwrite(df, meta={"centroids": centroids, "k": len(centroids)})
        return cls(spark, path)

    # ----------------------------------------------------------------- mutate

    def append(self, vecs: DataFrame, id_col: str = "vec_id", vec_col: str = "v") -> None:
        """Assign NEW vectors against the stored centroids and MERGE them in —
        the incremental path an embedding pipeline runs per batch; cost is
        O(batch) + the touched cells' COW rewrite, never a re-train or a
        corpus re-scan."""
        from frontera_spark.operators.pipeline import kmeans_assign

        asgn = kmeans_assign(vecs, self.centroids, id_col=id_col, vec_col=vec_col)
        df = (
            vecs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
            .join(asgn.select(F.col(id_col).alias("vec_id"), "cell"), "vec_id")
            .select("vec_id", "v", F.col("cell").cast("int").alias("partition_id"))
        )
        self.table.upsert(df)

    # ------------------------------------------------------------------ query

    def probe_cells(self, qv: list[float], nprobe: int = 2) -> list[int]:
        """The query's ``nprobe`` nearest cells by rounded dot product
        (ties → lowest cid — the assignment contract), computed driver-side
        against the k stored centroids."""
        dots = [
            _round4(sum(a * b for a, b in zip(qv, c))) for c in self.centroids
        ]
        return sorted(range(len(dots)), key=lambda i: (-dots[i], i))[:nprobe]

    def topk(
        self,
        qv: list[float],
        k: int = 10,
        nprobe: int = 2,
        exclude_ids: tuple = (),
    ) -> DataFrame:
        """Exact rounded-cosine top-k WITHIN the probed cells only: the scan
        is partition-pruned to ~nprobe/k_cells of the index files. Output
        (vec_id, cell, cos_sim, rk) — the q_ivf_topk shape."""
        cells = self.probe_cells(qv, nprobe)
        cand = self.table.read().filter(F.col("partition_id").isin(cells))
        if exclude_ids:
            cand = cand.filter(~F.col("vec_id").isin(list(exclude_ids)))
        nq = math.sqrt(sum(x * x for x in qv))
        q_arr = F.array(*[F.lit(float(x)) for x in qv])
        dot_q = F.aggregate(
            F.zip_with(F.col("v"), q_arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nv = F.sqrt(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("v"), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        cos = F.floor(dot_q / (nv * F.lit(nq)) * 10000.0 + 0.5) / 10000.0
        w = Window.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        return (
            cand.withColumn("cos_sim", cos)
            .select(
                "vec_id",
                F.col("partition_id").cast("long").alias("cell"),
                "cos_sim",
            )
            .withColumn("rk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rk") <= k)
        )

    def cell_counts(self) -> list[tuple[int, int]]:
        """(cell, n_vecs) straight from the manifest's lineage counters —
        metadata only, zero Spark jobs (the counters were read from parquet
        footers at commit time)."""
        return sorted(
            (int(p), int(c)) for p, c in self.table.counters().items()
        )
