"""Structured-Streaming ingestion (S6's sandbox-testable half).

frontera's Kafka bus (frontera/contrib/messagebus/kafkabus.py:~1-330) feeds
the workers three streams; the deterministic micro-batch loop replaces the
bus in-engine (SURVEY.md §1.5). This module is the *streaming front door*
for the two inbound streams, built on public Structured Streaming only:

- ``stream_seeds``: a file-source stream of seed lists (one URL per line,
  new files appear as crawls are commissioned) → ``foreachBatch`` →
  ``FrontierEngine.add_seeds``. The engine's exact seen-set makes redelivery
  idempotent, so end-to-end semantics are exactly-once even though the file
  source is at-least-once after checkpoint recovery.
- ``stream_results``: a file-source stream of spider-log JSON messages
  (codecs.RESULT_MSG_SCHEMA — what an external spider fleet posts) →
  decode → ``page_crawled`` + ``links_extracted`` per micro-batch.

Swapping the file source for ``format("kafka")`` (with codecs' key/value
shape) is a config change: foreachBatch bodies are source-agnostic.
Checkpointing is Spark's own (offset log in ``checkpoint_dir``) layered on
the engine's snapshot resume — a replayed micro-batch MERGEs the same rows
to the same states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frontera_spark.core.frontier import FrontierEngine
from frontera_spark.streaming.codecs import decode_results


def stream_seeds(
    engine: FrontierEngine,
    source_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream seed files into the frontier; returns the StreamingQuery.

    ``available_now=True`` drains everything currently in ``source_dir`` and
    stops (the batch-friendly trigger); pass False for a continuous 10s
    micro-batch trigger.
    """
    lines = engine.spark.readStream.format("text").load(source_dir)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        seeds = (
            batch_df.withColumn("seq", F.monotonically_increasing_id())
            .select(F.trim("value").alias("url"), "seq")
            .filter(F.col("url") != "")
        )
        engine.add_seeds(seeds)

    writer = lines.writeStream.foreachBatch(ingest).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()


def _results_ingest_fn(engine: FrontierEngine):
    """The spider-log micro-batch body, shared by every inbound transport
    (text files, Kafka-shaped bus frames, a real ``format("kafka")`` source):
    decode → page_crawled / request_error → links_extracted. Source-agnostic
    by construction — it only ever sees a ``value``-string batch frame."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        results = decode_results(batch_df.select(F.col("value"))).cache()
        ok = results.filter(F.col("status_code") < 400)
        err = results.filter(F.col("status_code") >= 400)
        links = ok.select(
            F.col("seq").alias("parent_seq"),
            (F.col("depth") + 1).alias("depth"),
            F.posexplode("out_links").alias("link_pos", "url"),
        ).select("url", "parent_seq", "link_pos", "depth")
        # fully fused ingestion: CRAWLED/ERROR transitions and the QUEUED
        # link inserts in one MERGE commit per micro-batch (an empty err
        # side unions to nothing)
        engine.ingest_results(ok, err, links)
        results.unpersist()

    return ingest


def stream_results(
    engine: FrontierEngine,
    source_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream spider-log JSON messages (external fleet → engine): mark pages
    crawled and schedule their extracted links, one MERGE set per
    micro-batch."""
    raw = engine.spark.readStream.format("text").load(source_dir)
    writer = raw.writeStream.foreachBatch(_results_ingest_fn(engine)).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()


# Exactly the column set Spark's Kafka source produces (minus the
# timestampType int, which no consumer here reads): the wire contract the
# fake bus and a real ``format("kafka")`` stream share.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp"
)


def kafka_shaped_stream(spark, source_dir: str) -> DataFrame:
    """An embedded FAKE Kafka source: a parquet file-stream whose rows carry
    the exact Kafka wire schema (``KAFKA_WIRE_SCHEMA`` — binary key/value +
    topic/partition/offset/timestamp). Tests write codec-framed messages
    (codecs.encode_results → key/value cast to binary) into ``source_dir``
    and the engine consumes them through the same column contract a real
    broker would present — closing the S6 integration gap offline. In
    production this one line becomes
    ``spark.readStream.format("kafka").option("subscribe", topic).load()``;
    nothing downstream changes."""
    return spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(source_dir)


def stream_results_from_bus(
    engine: FrontierEngine,
    bus: DataFrame,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Spider-log ingestion from a Kafka-SHAPED streaming frame (real broker
    or ``kafka_shaped_stream`` fake): casts the binary ``value`` to string —
    the one transport-specific step — then runs the identical micro-batch
    body as ``stream_results``. The binary ``key`` is the codec's
    fingerprint-partition id (X1 framing); it routed the message on the bus
    and is not re-read here."""
    raw = bus.select(F.col("value").cast("string").alias("value"))
    writer = raw.writeStream.foreachBatch(_results_ingest_fn(engine)).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()


def stream_host_stats(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    queryName: str = "host_stats",
):
    """Event-time crawl telemetry: tumbling-window per-host fetch/error
    counts over the spider-log stream, with a watermark bounding late data.

    frontera's stats stream is processing-time counters (worker/stats.py);
    this is the Spark-native upgrade the bus never had: ``fetched_at`` event
    time, ``withWatermark`` so state for closed windows is dropped (bounded
    state at 10^10 fetches), append-mode emission of FINALIZED windows only
    — a message arriving later than the watermark is dropped, not
    double-counted. Sink is an in-memory table named ``queryName`` (swap for
    parquet/Kafka in production; the aggregation is sink-agnostic).
    """
    raw = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(source_dir)
    results = decode_results(raw.select(F.col("value")))
    agg = (
        results.filter(F.col("fetched_at").isNotNull())
        .withWatermark("fetched_at", watermark_delay)
        .groupBy(F.window("fetched_at", window_duration).alias("w"), F.col("host"))
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum((F.col("status_code") >= 400).cast("int")).alias("n_errors"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_fetched",
            "n_errors",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_polite_gate(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    capacity: float = 2.0,
    refill_per_batch: float = 2.0,
    queryName: str = "polite_gate",
    refill_mode: str = "appearance",
):
    """Custom STATEFUL streaming operator (``applyInPandasWithState``):
    per-host token-bucket admission over the spider-feed stream.

    The batch engine enforces politeness inside the batch generator
    (core/politeness.py, time-based refill); this is the streaming-mode
    equivalent frontera's OverusedBuffer played (frontera/core/__init__.py
    ~20-120): requests for a host beyond its budget are DEFERRED, others
    served, and the per-host bucket survives across micro-batches as
    operator state. Requests admit in global ``seq`` order within the
    micro-batch — replaying the same batches yields the same decisions, so
    checkpoint recovery is exactly-once.

    Two DETERMINISTIC refill clocks (``refill_mode``):

    - ``"appearance"`` (default): tokens refill by ``refill_per_batch`` per
      micro-batch IN WHICH THE HOST APPEARS (the state function only runs
      for present hosts; capped at ``capacity``). With refill == capacity a
      returning host always serves at full budget; a smaller refill
      throttles per feed appearance, not per elapsed time.
    - ``"batch_clock"`` (r4, closes the r3 divergence from the batch
      scheduler): tokens refill by ``refill_per_batch`` × Δbatch_id — the
      feed's monotone crawl-iteration counter is the TIME axis, so a host
      absent for 5 iterations returns with 5 refills (capped), exactly like
      the batch scheduler's clock-based buckets with the iteration counter
      as the clock. batch_id rides IN the data, so replay after a crash
      reproduces the same refills — a processing-time clock would not.

    State is one (tokens, last_batch) row per host — bounded by host count,
    not by traffic.
    """
    import pandas as pd  # noqa: F401  (worker-side)
    from pyspark.sql.streaming.state import GroupStateTimeout

    from frontera_spark.streaming.codecs import decode_feed

    if refill_mode not in ("appearance", "batch_clock"):
        raise ValueError(f"refill_mode must be appearance|batch_clock, got {refill_mode!r}")

    raw = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(source_dir)
    feed = decode_feed(raw.select(F.col("value")))

    out_schema = "host string, seq long, url string, served boolean"
    state_schema = "tokens double, last_batch long"
    by_clock = refill_mode == "batch_clock"

    def gate(key, pdf_iter, state):
        import pandas as pd

        (host,) = key
        if state.exists:
            tokens, last_batch = state.get
            if last_batch is not None and last_batch < 0:
                last_batch = None  # -1 = "no clock yet" sentinel
            if not by_clock:
                tokens = min(float(capacity), tokens + float(refill_per_batch))
        else:
            tokens, last_batch = float(capacity), None
        # drain the whole group BEFORE sorting: the iterator yields Arrow
        # chunks whose boundaries depend on partition layout — sorting each
        # chunk independently would admit chunk-locally, not in global seq
        # order, and replay after a repartition could serve different rows.
        # batch_id leads the sort so the clock only moves forward.
        pdf = pd.concat(list(pdf_iter), ignore_index=True).sort_values(
            ["batch_id", "seq"] if by_clock else "seq"
        )
        served = []
        for b in pdf["batch_id"].tolist():
            if by_clock and last_batch is not None and b > last_batch:
                tokens = min(
                    float(capacity),
                    tokens + float(refill_per_batch) * (b - last_batch),
                )
            if by_clock:
                last_batch = b if last_batch is None else max(last_batch, b)
            if tokens >= 1.0:
                tokens -= 1.0
                served.append(True)
            else:
                served.append(False)
        yield pd.DataFrame(
            {
                "host": host,
                "seq": pdf["seq"].to_numpy(),
                "url": pdf["url"].to_numpy(),
                "served": served,
            }
        )
        state.update((tokens, -1 if last_batch is None else int(last_batch)))

    gated = feed.groupBy("host").applyInPandasWithState(
        gate, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return (
        gated.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
