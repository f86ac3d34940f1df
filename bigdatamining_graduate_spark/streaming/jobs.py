"""Structured Streaming over the events table (M6 — extension, not parity:
the reference has zero streaming, SURVEY.md §2.10).

Each job reads the events parquet as a STREAM (file source + explicit
schema — never inferSchema on a stream), applies watermarked event-time
logic, runs to completion with the ``availableNow`` trigger into a memory
sink, and returns the materialized result. Because availableNow drains the
full fixture, results equal the batch computation — so these streaming
operators get full DuckDB oracle checks, not rows-only.

Scale: file source → Kafka swap is a one-line change; watermarks bound
state; the windowed aggregates shuffle once on (window, key).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import ensure_runtime_confs

#: schema of the events parquet AS STORED (ts = TIMESTAMP(NANOS) read as
#: bigint under legacy.parquet.nanosAsLong)
_EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_sink_ids = itertools.count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a stream with proper event-time ``ts``."""
    ensure_runtime_confs(spark)
    # the file source wants a DIRECTORY; select just events.parquet from
    # the fixture dir via glob filter
    raw = (
        spark.readStream.schema(_EVENTS_RAW)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(result: DataFrame, mode: str = "complete") -> DataFrame:
    """Drain the stream with availableNow into a uniquely-named memory
    sink; return the materialized table."""
    name = f"stream_sink_{next(_sink_ids)}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return result.sparkSession.table(name)


def hourly_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time window + 2h watermark: count + exact sum per
    (window, event_type). Window start exported as epoch seconds."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(20,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return _run_to_memory(agg)


HOURLY_TYPE_COUNTS_SQL = """
SELECT cast(epoch(date_trunc('hour', ts)) as bigint) AS window_start,
       event_type,
       count(*) AS n,
       cast(sum(cast(value as decimal(20,2))) as double) AS sum_value
FROM events
GROUP BY 1, 2
"""


def sliding_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h size / 30m slide) average value per window —
    each event contributes to two windows."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("value").alias("n"),
            (F.sum(F.col("value").cast("decimal(20,2)")).cast("double") / F.count("value")).alias(
                "avg_value"
            ),
        )
        .select(F.unix_timestamp("w.start").alias("window_start"), "n", "avg_value")
    )
    return _run_to_memory(agg)


SLIDING_AVG_VALUE_SQL = """
WITH expanded AS (
  -- epoch_us floor-division: truncation, matching Spark's microsecond
  -- window arithmetic (epoch()::BIGINT would ROUND and shift boundaries)
  SELECT (epoch_us(ts) // 1800000000) * 1800 - o.off AS window_start, value
  FROM events
  CROSS JOIN (SELECT unnest([0, 1800]) AS off) o
)
SELECT window_start,
       count(value) AS n,
       cast(sum(cast(value as decimal(20,2))) as double) / count(value) AS avg_value
FROM expanded
GROUP BY window_start
"""


def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup on event_id (watermark-bounded state) then
    per-type counts — the streaming form of A12."""
    ev = read_events_stream(spark, sf_dir)
    deduped = ev.withWatermark("ts", "2 hours").dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count("*").alias("n"))
    return _run_to_memory(agg)


STREAMING_DEDUP_COUNTS_SQL = """
SELECT event_type, count(*) AS n
FROM (SELECT DISTINCT ON (event_id) event_id, event_type FROM events ORDER BY event_id)
GROUP BY event_type
"""


def stream_static_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join — the one streaming join class the engine's
    surface was missing: the events STREAM enriched against the static
    customer dimension (stream-side rows join the latest static snapshot
    per micro-batch, no state store involved), then counts + exact value
    sums per market segment.

    Scale: the static side is a dimension table — Catalyst broadcasts it
    into every micro-batch task, so the streaming side never shuffles for
    the join; the single shuffle is the final segment aggregate."""
    from ..sources.catalog import load_table

    ev = read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = ev.join(cust, "user_id")
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(20,2)")).cast("double").alias("sum_value"),
    )
    return _run_to_memory(agg)


STREAM_STATIC_SEGMENT_COUNTS_SQL = """
SELECT c.c_mktsegment, count(*) AS n,
       cast(sum(cast(e.value as decimal(20,2))) as double) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


# -- unbounded (Kafka-style) source demo ------------------------------------

RATE_ROWS_PER_BATCH = 5000
RATE_BATCHES = 3
RATE_ADVANCE_MS = 60_000               # one minute of event time per batch
RATE_START_MS = 946_684_800_000        # 2000-01-01T00:00:00Z
RATE_BUCKETS = 10


def rate_stream_minute_buckets(spark: SparkSession) -> DataFrame:
    """Windowed aggregation over an UNBOUNDED generator source — the
    Kafka-shaped ingestion path (the file-source jobs above drain a finite
    fixture; this one consumes a source with no end).

    Uses ``rate-micro-batch`` pinned to a fixed ``startTimestamp`` /
    ``advanceMillisPerBatch``, advanced exactly ``RATE_BATCHES`` batches by
    re-running a one-batch trigger over a shared checkpoint — so the
    result is bit-deterministic and gets a full value oracle (generator
    arithmetic in SQL), unlike a wall-clock rate stream. Swapping in Kafka
    changes only the reader options; the aggregation is the standard
    tumbling-window shuffle on (window, bucket). In production the demo's
    ``complete`` mode becomes ``update``/``append`` + watermark so state
    stays bounded; here complete mode is what lets the memory sink hold
    the final table."""
    import tempfile

    ensure_runtime_confs(spark)
    ckpt = tempfile.mkdtemp(prefix="bdm_rate_ckpt_")
    name = f"stream_sink_{next(_sink_ids)}"
    for _ in range(RATE_BATCHES):
        src = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", RATE_ROWS_PER_BATCH)
            .option("numPartitions", 8)
            .option("startTimestamp", RATE_START_MS)
            .option("advanceMillisPerBatch", RATE_ADVANCE_MS)
            .load()
        )
        agg = (
            src.groupBy(
                F.window("timestamp", "1 minute").getField("start").cast("long").alias("minute_start"),
                (F.col("value") % RATE_BUCKETS).alias("bucket"),
            )
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(once=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


#: generator-arithmetic oracle: value i lands in batch i // rowsPerBatch,
#: whose (constant) timestamp is start + batch * advance
RATE_MINUTE_BUCKETS_SQL = f"""
SELECT {RATE_START_MS // 1000} + (i // {RATE_ROWS_PER_BATCH}) * {RATE_ADVANCE_MS // 1000} AS minute_start,
       i % {RATE_BUCKETS} AS bucket,
       count(*) AS n,
       cast(sum(i) as bigint) AS sum_value
FROM (SELECT range AS i FROM range(0, {RATE_BATCHES * RATE_ROWS_PER_BATCH}))
GROUP BY 1, 2
"""
