from frontera_spark.plans.snapshot import SnapshotTable  # noqa: F401
