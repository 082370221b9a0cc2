"""frontera_spark — a from-scratch PySpark-native crawl frontier + fetch scheduler.

Capability-parity target: the public ``frontera`` crawl-frontier framework
(reference fork: yuanbei/frontera; see SURVEY.md). This is NOT a port — the
reference is a row-oriented object-per-URL framework over Kafka/HBase; this
engine re-expresses the same semantics (URL canonicalization + fingerprinting,
exact URL-seen set with bloom/cuckoo pre-filters, per-host priority queues with
FIFO/LIFO/BFS/DFS strategies, politeness token buckets, robots gating,
snapshot-resumable state) as declarative PySpark DataFrame plans over
partitioned Parquet snapshot tables.

Layout
------
- ``functions``  : scalar/vectorized column functions (canonicalize, fingerprints)
- ``core``       : frontier engine (states, strategies, scheduler, politeness, seen set)
- ``plans``      : snapshot-table layer (Iceberg-shaped MERGE/commit over Parquet)
- ``sources``    : corpus generator (image+caption), seed loader, PNG codec
- ``operators``  : training-data pipeline ops (dedup, similarity, text stats, multimodal)
- ``streaming``  : the crawl micro-batch loop
"""

__version__ = "0.1.0"

STATE_NOT_CRAWLED = 0  # frontera/core/components.py:~150 States.NOT_CRAWLED
STATE_QUEUED = 1
STATE_CRAWLED = 2
STATE_ERROR = 3
STATE_SKIPPED_ROBOTS = 4  # extension: robots.txt-gated URLs (not in reference)
