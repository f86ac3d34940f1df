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

from ..session import ensure_runtime_confs
from ..sources.catalog import normalize_events_ts, table_path

_sink_ids = itertools.count()


def _stage_batches(df: DataFrame, bid_col, n: int, indir: str, stage: str) -> None:
    """Stage ``df``'s ``n`` micro-batch slices as ``indir/batch{i}.parquet``
    (one file per batch, arrival order pinned by mtime) with ONE pass over
    ``df`` (round 11, guide §1.2): the old per-slice loop re-scanned the
    corpus once per batch (``df.filter(bid == i).coalesce(1).write`` × n).
    ``bid_col`` is an int-valued column giving each row's batch id in
    [0, n); a hash ``repartition`` on it puts every id's rows in exactly
    one task, so ``partitionBy`` leaves exactly one file per id (asserted
    — an empty slice would break the trigger count and must fail loudly).
    ``partitionBy`` drops the id column from the file contents, so the
    staged schema is identical to the old per-slice writes."""
    import glob
    import os
    import shutil

    tmp = os.path.join(stage, "slices")
    (
        df.withColumn("__b", bid_col.cast("int"))
        .repartition(n, "__b")
        .write.partitionBy("__b")
        .parquet(tmp)
    )
    for i in range(n):
        files = glob.glob(os.path.join(tmp, f"__b={i}", "*.parquet"))
        dst = os.path.join(indir, f"batch{i}.parquet")
        if not files:
            # an empty slice still needs its trigger file (the old
            # per-slice loop wrote one); partitionBy skips empty values
            empty_dir = os.path.join(tmp, f"__empty{i}")
            df.limit(0).coalesce(1).write.parquet(empty_dir)
            files = glob.glob(os.path.join(empty_dir, "*.parquet"))
        assert len(files) == 1, f"batch {i}: expected 1 staged file, got {files}"
        shutil.move(files[0], dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    shutil.rmtree(tmp)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a stream with proper event-time ``ts``.

    The stream source needs an explicit schema; it must match the file's
    PHYSICAL encoding (fixture generations have stored ``ts`` as bigint
    nanos and as TIMESTAMP_NTZ micros), so take it from the parquet footer
    via a zero-row batch read, then normalize ``ts`` to TimestampType."""
    import os

    ensure_runtime_confs(spark)
    ev_path = table_path(sf_dir, "events")
    stored = spark.read.parquet(ev_path).schema
    if os.path.isdir(ev_path):
        # directory-parquet layout (e.g. tools/synth_scale.py output):
        # the dir itself is the stream source
        raw = spark.readStream.schema(stored).parquet(ev_path)
    else:
        # single-file fixture layout: the file source wants a DIRECTORY;
        # select just events.parquet from the fixture dir via glob filter
        raw = (
            spark.readStream.schema(stored)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir.rstrip("/"))
        )
    return normalize_events_ts(raw)


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


#: late-data fixture geometry (events span 2024-01-01..30): arrival order
#: is b0=[16,23) on time, b1=[23,24) buffer, b2=[1,16) LATE, b3=[24,31).
#: The buffer exists because the late-input filter LAGS the reported
#: watermark by one micro-batch (measured on this engine version: the
#: filter for batch N uses event-time stats through batch N−2, while
#: state eviction/emission uses stats through N−1) — so the late batch
#: must arrive two batches after the one whose max event time defines its
#: drop line. With a 7-day watermark: b2 is filtered at
#: max(b0)−7d ≈ Jan 15.9 (most drops, the last hours survive), and the
#: final no-data batch emits every window ending ≤ max(all)−7d ≈ Jan 23.9.
LATE_SPLITS = ["2024-01-16 00:00:00", "2024-01-23 00:00:00", "2024-01-24 00:00:00"]
LATE_DELAY_DAYS = 7


def late_data_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA semantics, deterministically: the events table
    is staged as four single-file micro-batches arriving OUT of event-time
    order (see ``LATE_SPLITS``), streamed with ``maxFilesPerTrigger=1``.
    The late batch is processed under an already-advanced watermark, so
    the engine DROPS its rows whose hourly window closed below the line
    and merges the rest; the trailing batches advance the watermark
    further so append mode EMITS the finalized windows. Every boundary is
    a pure function of the fixture, so the drop AND emission sets are
    exactly reproducible by the batch oracle.

    Mode caveat (measured on this engine version): update-mode
    aggregation does NOT filter late input — late rows re-create evicted
    windows — so append is the mode that actually enforces the drop
    policy; this query pins that behavior.

    Scale: the watermark is what BOUNDS STATE at 100 TB/day — without it
    every hourly window since the beginning of time stays in the state
    store; with it, state is O(windows inside the lateness horizon) and
    the drop policy is explicit and measurable."""
    import glob
    import os
    import shutil
    from ..staging import staging_dir

    ensure_runtime_confs(spark)
    raw = normalize_events_ts(spark.read.parquet(table_path(sf_dir, "events")))
    ts = F.col("ts")
    c0, c1, c2 = [F.lit(c).cast("timestamp") for c in LATE_SPLITS]
    stage = staging_dir(prefix="bdm_late_stream_")
    indir = os.path.join(stage, "in")
    os.makedirs(indir)
    # arrival order != event-time order. File-source batch order follows
    # modification time (oldest first), pinned explicitly so ordering
    # never depends on write latency.
    arrival = [
        (ts >= c0) & (ts < c1),  # on time: establishes the drop line
        (ts >= c1) & (ts < c2),  # on-time buffer (filter lags one batch)
        ts < c0,                 # LATE: filtered at max(b0)-delay
        ts >= c2,                # advances max; final no-data batch emits
    ]
    bid = (
        F.when(arrival[0], 0)
        .when(arrival[1], 1)
        .when(arrival[2], 2)
        .when(arrival[3], 3)
    )  # no otherwise: a row matching no slice stages nowhere, as before
    _stage_batches(raw, bid, len(arrival), indir, stage)
    # staged files were written by Spark with ts already TimestampType, so
    # the stream schema is exactly the normalized batch schema
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
    )
    agg = (
        stream.withWatermark("ts", f"{LATE_DELAY_DAYS} days")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp("w.start").alias("window_start"), "n")
    )
    return _run_to_memory(agg, mode="append")


LATE_DATA_HOURLY_COUNTS_SQL = f"""
WITH wm AS (
  SELECT
    (SELECT max(ts) FROM events
      WHERE ts >= TIMESTAMP '{LATE_SPLITS[0]}' AND ts < TIMESTAMP '{LATE_SPLITS[1]}')
      - INTERVAL {LATE_DELAY_DAYS} DAY AS drop_line,
    (SELECT max(ts) FROM events) - INTERVAL {LATE_DELAY_DAYS} DAY AS emit_line
),
kept AS (
  SELECT e.ts FROM events e, wm
  WHERE e.ts >= TIMESTAMP '{LATE_SPLITS[0]}'
     OR date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm.drop_line
)
SELECT cast(epoch(date_trunc('hour', ts)) as bigint) AS window_start,
       count(*) AS n
FROM kept, wm
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.emit_line
GROUP BY 1
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
    from ..staging import staging_dir

    ensure_runtime_confs(spark)
    ckpt = staging_dir(prefix="bdm_rate_ckpt_")
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


SS_JOIN_WINDOW_MIN = 30  # error must follow the click within this many minutes


def stream_stream_click_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join with event-time bounds: each user's click
    stream joined to their error stream where the error lands within
    ``SS_JOIN_WINDOW_MIN`` minutes AFTER the click — the funnel/causality
    join (q62's batch range join, streaming form). Both sides carry
    watermarks and the join predicate carries the time range, which is
    what lets the state store evict: a buffered click can be dropped once
    the error-side watermark passes click.ts + window, so state is
    O(events inside the lateness horizon), never the full history.

    With an availableNow drain (single batch) an INNER time-bounded join
    emits exactly the batch-join result, so the oracle is plain SQL.
    Scale: the join shuffles both sides once on user_id; the time range
    is enforced inside the state store, not as a post-join filter over a
    wider product."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    errors = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user_id"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", "2 hours")
    )
    joined = clicks.join(
        errors,
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (F.col("error_ts") < F.col("click_ts") + F.expr(f"INTERVAL {SS_JOIN_WINDOW_MIN} MINUTES")),
        "inner",
    )
    out = joined.select(
        "user_id",
        "click_id",
        "error_id",
        (F.unix_timestamp("error_ts") - F.unix_timestamp("click_ts")).alias("gap_sec"),
    )
    return _run_to_memory(out, mode="append")


STREAM_STREAM_CLICK_ERRORS_SQL = f"""
SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id,
       cast(epoch(date_trunc('second', e.ts)) - epoch(date_trunc('second', c.ts)) as bigint) AS gap_sec
FROM events c JOIN events e
  ON c.user_id = e.user_id
 AND e.ts >= c.ts
 AND e.ts < c.ts + INTERVAL {SS_JOIN_WINDOW_MIN} MINUTE
WHERE c.event_type = 'click' AND e.event_type = 'error'
"""


#: left-outer stream-stream geometry: three single-file micro-batches in
#: EVENT-TIME order (no late data — the outer join's own state eviction is
#: the semantics under test), 7-day watermark >> 30-min join window so no
#: potential match is ever evicted early.
SS_LEFT_SPLITS = ["2024-01-11 00:00:00", "2024-01-21 00:00:00"]
SS_LEFT_DELAY_DAYS = 7
SS_LEFT_WINDOW_MIN = 30


def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM **left outer** join with watermark state eviction —
    the hardest standard streaming join: matched (click, error) pairs
    emit as they meet in state (inner semantics), and an UNMATCHED click
    emits its null-padded row only when the watermark passes
    ``click_ts + window`` — i.e. when the state store can PROVE no match
    can still arrive. Events are staged as three event-time-ordered
    single-file micro-batches (``maxFilesPerTrigger=1``) so the watermark
    trajectory — and therefore exactly WHICH unmatched clicks have been
    finalized by end-of-stream — is a pure function of the fixture:
    measured on this engine version, the final availableNow batch applies
    the join watermark min(max click_ts, max error_ts) - delay — the MIN
    across the two inputs, each tracking stats AFTER its event_type
    filter — and null rows emit for clicks with ``click_ts + window <
    that line`` (clicks inside the final horizon stay buffered forever —
    the honest cost of outer streaming joins, pinned here rather than
    papered over; the one-row divergence that exposed the min-semantics
    is exactly why the emission set is oracle-checked, not assumed).

    Scale: state is O(events inside delay + window), both sides shuffle
    once on user_id; the time bound lives in the join condition, which is
    what lets eviction work at all."""
    import glob
    import os
    import shutil
    from ..staging import staging_dir

    ensure_runtime_confs(spark)
    raw = normalize_events_ts(spark.read.parquet(table_path(sf_dir, "events")))
    ts = F.col("ts")
    c0, c1 = [F.lit(c).cast("timestamp") for c in SS_LEFT_SPLITS]
    stage = staging_dir(prefix="bdm_ssleft_")
    indir = os.path.join(stage, "in")
    os.makedirs(indir)
    _stage_batches(
        raw,
        # no otherwise: a null-ts row staged nowhere under the old
        # per-predicate loop, and still stages nowhere here
        F.when(ts < c0, 0).when(ts < c1, 1).when(ts >= c1, 2),
        3,
        indir,
        stage,
    )

    def mkstream():
        return (
            spark.readStream.schema(raw.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(indir)
        )

    clicks = (
        mkstream()
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", f"{SS_LEFT_DELAY_DAYS} days")
    )
    errors = (
        mkstream()
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user_id"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", f"{SS_LEFT_DELAY_DAYS} days")
    )
    joined = clicks.join(
        errors,
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (
            F.col("error_ts")
            < F.col("click_ts") + F.expr(f"INTERVAL {SS_LEFT_WINDOW_MIN} MINUTES")
        ),
        "left_outer",
    )
    out = joined.select(
        "user_id",
        "click_id",
        "error_id",
        (F.unix_micros("error_ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )
    return _run_to_memory(out, mode="append")


STREAM_STREAM_LEFT_OUTER_SQL = f"""
WITH wm AS (
  -- the join's watermark is the MIN across its two inputs, and each
  -- input's event-time stats are tracked AFTER the event_type filter --
  -- so the emit line follows whichever filtered stream ends earlier
  SELECT least(
           (SELECT max(ts) FROM events WHERE event_type = 'click'),
           (SELECT max(ts) FROM events WHERE event_type = 'error')
         ) - INTERVAL {SS_LEFT_DELAY_DAYS} DAY AS emit_line
  FROM events LIMIT 1
),
c AS (
  SELECT event_id AS click_id, user_id, ts AS cts FROM events
  WHERE event_type = 'click'
),
e AS (
  SELECT event_id AS error_id, user_id, ts AS ets FROM events
  WHERE event_type = 'error'
),
m AS (
  SELECT c.user_id, c.click_id, e.error_id,
         epoch_us(e.ets) - epoch_us(c.cts) AS gap_us
  FROM c JOIN e ON e.user_id = c.user_id
   AND e.ets >= c.cts
   AND e.ets < c.cts + INTERVAL {SS_LEFT_WINDOW_MIN} MINUTE
)
SELECT user_id, click_id, error_id, gap_us FROM m
UNION ALL
SELECT c.user_id, c.click_id,
       cast(NULL as bigint) AS error_id, cast(NULL as bigint) AS gap_us
FROM c, wm
WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.click_id = c.click_id)
  AND c.cts + INTERVAL {SS_LEFT_WINDOW_MIN} MINUTE < wm.emit_line
"""


def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental dedup — the crawl-ingestion shape: NEW
    documents arrive as a stream, are fingerprinted, anti-joined against
    the STATIC historical corpus fingerprints (q77's batch operator, now
    per micro-batch), deduped within the stream itself, and counted per
    language. History = even doc_ids, stream = odd doc_ids (the
    deterministic, sf-independent split).

    Scale: the static fingerprint side is loaded once and joined into
    every micro-batch (broadcast while it fits; at 100 TB it becomes a
    bucketed table and the anti-join co-locates on the fingerprint).
    The STREAM's dedup state holds only fingerprints seen in this run —
    bounded by ingest volume, not corpus size — which is exactly why
    incremental dedup scales where re-running global dedup doesn't."""
    from ..functions.text import normalize_text

    import os

    ensure_runtime_confs(spark)
    doc_path = table_path(sf_dir, "documents")
    stored = spark.read.parquet(doc_path).schema
    if os.path.isdir(doc_path):
        # directory-parquet layout (e.g. tools/synth_scale.py output):
        # the dir itself is the stream source
        raw = spark.readStream.schema(stored).parquet(doc_path)
    else:
        # single-file fixture layout: file source needs a directory, so
        # stream the fixture dir with a glob pinned to this one file
        raw = (
            spark.readStream.schema(stored)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir.rstrip("/"))
        )
    fp = F.md5(normalize_text("text")).alias("fp")
    new = raw.filter(F.col("doc_id") % 2 == 1).select(fp, "lang")
    hist = (
        spark.read.parquet(table_path(sf_dir, "documents"))
        .filter(F.col("doc_id") % 2 == 0)
        .select(F.md5(normalize_text("text")).alias("fp"))
        .distinct()
    )
    kept = new.join(hist, "fp", "left_anti").dropDuplicates(["fp", "lang"])
    agg = kept.groupBy("lang").agg(F.count("*").alias("n_new"))
    return _run_to_memory(agg)


def stream_incremental_dedup_sql() -> str:
    from ..functions.text import normalize_text_sql

    norm = normalize_text_sql("text")
    return f"""
    WITH hist AS (
      SELECT DISTINCT md5({norm}) AS fp FROM documents WHERE doc_id % 2 = 0
    ),
    new AS (
      SELECT DISTINCT md5({norm}) AS fp, lang FROM documents WHERE doc_id % 2 = 1
    )
    SELECT lang, count(*) AS n_new
    FROM new n
    WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = n.fp)
    GROUP BY lang
    """


def dedup_within_watermark_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` — the BOUNDED-STATE form of
    q38's streaming dedup. Plain ``dropDuplicates`` keeps every key ever
    seen (state grows with ingest volume forever); the WithinWatermark
    variant guarantees dedup only among events whose event times fall
    inside the watermark horizon and EVICTS older keys — the honest
    trade a 100 TB/day stream must make. The input is the event stream
    UNIONED with a second read of itself, so every event_id genuinely
    arrives twice and the operator's dropping is exercised, not vacuous.

    The fixture spans ~30 days and the horizon is 60 days, so every
    duplicate lands inside the guarantee window and the drained result
    equals DISTINCT-on-event_id exactly — which is what makes the batch
    oracle expressible. (With a shorter horizon the result would depend
    on micro-batch arrival order — correct streaming behavior, but not
    batch-reproducible.)"""
    a = read_events_stream(spark, sf_dir)
    b = read_events_stream(spark, sf_dir)
    deduped = (
        a.unionByName(b)
        .withWatermark("ts", "60 days")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    agg = deduped.groupBy("event_type").agg(F.count("*").alias("n"))
    return _run_to_memory(agg)


DEDUP_WITHIN_WATERMARK_SQL = """
SELECT event_type, count(*) AS n
FROM (SELECT DISTINCT event_id, event_type FROM events)
GROUP BY event_type
"""


def hourly_then_daily_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED streaming window aggregation (window-on-window): hourly
    per-type counts feed a second stateful aggregation that takes the
    daily MAX of the hourly counts — the streaming form of 'peak hourly
    rate per day', impossible before multi-stateful-operator support
    (one job, one state store pipeline, no intermediate sink).

    Emission is append-mode: a day window is final once the watermark
    (max event time − 1 h) passes its end, so the drained result holds
    every day except the horizon tail — the batch oracle applies the
    same cutoff (``d + 1 day <= max(ts) − 1 h``), making the emission
    set an exact function of the fixture.

    Scale: state is O(open windows), two levels deep; the second level
    holds |types| × |open days| rows. The chained form avoids landing
    the hourly stream in a sink and re-reading it — one shuffle per
    level, same as the batch twin."""
    ev = read_events_stream(spark, sf_dir)
    hourly = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("hw"), "event_type")
        .agg(F.count("*").alias("n_h"))
    )
    daily = (
        hourly.groupBy(F.window("hw", "1 day").alias("dw"), "event_type")
        .agg(F.max("n_h").alias("max_hourly"), F.count("*").alias("n_hours"))
    )
    out = daily.select(
        F.unix_timestamp("dw.start").alias("day_start"),
        "event_type",
        "max_hourly",
        "n_hours",
    )
    return _run_to_memory(out, mode="append")


HOURLY_THEN_DAILY_MAX_SQL = """
WITH line AS (SELECT max(ts) - INTERVAL 1 HOUR AS wl FROM events),
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
         count(*) AS n_h
  FROM events GROUP BY 1, 2, 3)
SELECT cast(epoch(d) as bigint) AS day_start, event_type,
       max(n_h) AS max_hourly, count(*) AS n_hours
FROM hourly, line
WHERE d + INTERVAL 1 DAY <= line.wl
GROUP BY 1, 2
"""


# -- streaming incremental LSH maintenance (round 8) -------------------------

STREAM_LSH_BATCHES = 3  # documents arrive as 3 hash-sliced micro-batches


def _stream_lsh_batch_flag(id_col: str = "doc_id"):
    from ..functions.hashing import portable_hash64

    return (
        portable_hash64(F.col(id_col).cast("string"), salt="slsh")
        % STREAM_LSH_BATCHES
    )


def stream_incremental_lsh_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """q227's maintenance loop run as an ACTUAL stream: documents arrive
    in three hash-sliced micro-batches (staged files,
    ``maxFilesPerTrigger=1``, arrival order pinned by mtime), and a
    ``foreachBatch`` handler maintains the persisted state a production
    refresh would — a parquet SIGNATURE STORE grown by one
    batch-id-keyed subdirectory per trigger (mode=overwrite, so a
    replayed micro-batch overwrites its own previous attempt: the
    idempotent-sink shape Spark's foreachBatch contract requires for
    exactly-once) — and
    emits each batch's FRESH pairs (>=1 endpoint in the batch: the
    batch's bands equi-joined against store ∪ batch bands).  Every pair
    is emitted exactly once, in the micro-batch where its LATER endpoint
    arrives — so the accumulated emission across the drained stream
    equals the full batch LSH recompute, with ``first_seen`` =
    greatest(batch(a), batch(b)) as the provenance column.  The handler
    ASSERTS that identity per batch (emitted first_seen == its batch
    id), making the plumbing self-checking; the DuckDB oracle is the
    full batch pipeline + the same first_seen expression, so the driver
    hash-match proves stream == batch (the q209 discipline applied to
    q26/q227).

    Scale: per micro-batch the work is O(|batch| bands) + one
    bucket-key equi-join against the store's band table; the signature
    store grows by |batch| rows per trigger and is never re-signed.
    Swap the staged-file source for Kafka and the parquet store for a
    Delta/Hudi table and this IS the production shape.
    Reference anchor: ``hw3/hw3.py:125-172`` (extension — the reference
    has zero streaming)."""
    import glob
    import os
    import shutil
    from ..staging import staging_dir

    from ..operators import dedup as DD

    docs = spark.read.parquet(table_path(sf_dir, "documents")).select(
        "doc_id", "text"
    )
    stage = staging_dir(prefix="bdm_stream_lsh_")
    indir = os.path.join(stage, "in")
    sig_store = os.path.join(stage, "sig_store")
    out_dir = os.path.join(stage, "pairs_out")
    os.makedirs(indir)
    bflag = _stream_lsh_batch_flag()
    _stage_batches(docs, bflag, STREAM_LSH_BATCHES, indir, stage)

    def handle(batch_df: DataFrame, bid: int) -> None:
        # Scoped checkpoint lifetime (ADVICE r8): the handler runs inside
        # the caller's session, so a global release_checkpoints() here
        # would unpersist blocks the CALLER still owns.  Snapshot the
        # ledger on entry, release only this handler's delta on exit.
        from ..checkpoints import (
            local_checkpoint,
            release_new_since,
            tracked_ids,
        )

        ledger_before = tracked_ids()
        sig_new = DD.minhash_signatures(batch_df)
        if glob.glob(os.path.join(sig_store, "*", "*.parquet")):
            all_sig = (
                spark.read.option("recursiveFileLookup", "true")
                .parquet(sig_store)
                .unionByName(sig_new)
            )
        else:
            all_sig = sig_new
        # the two band joins + the signature filter all read these twice
        # — materialize once per batch, release before the next trigger
        all_sig = local_checkpoint(all_sig, eager=False)
        bands_new = DD.signature_bands(
            local_checkpoint(sig_new, eager=False)
        ).alias("d")
        bands_all = DD.signature_bands(all_sig).alias("x")
        fresh = (
            bands_new.join(bands_all, ["band", "bh"])
            .filter(F.col("d.doc_id") != F.col("x.doc_id"))
            .select(
                F.least(F.col("d.doc_id"), F.col("x.doc_id")).alias("doc_a"),
                F.greatest(F.col("d.doc_id"), F.col("x.doc_id")).alias(
                    "doc_b"
                ),
            )
            .distinct()
        )
        pairs = DD.filter_pairs_by_signature(
            fresh, all_sig, threshold
        ).withColumn(
            "first_seen",
            F.greatest(
                _stream_lsh_batch_flag("doc_a"),
                _stream_lsh_batch_flag("doc_b"),
            ).cast("bigint"),
        )
        # Idempotent sink (ADVICE r8 / Spark's foreachBatch exactly-once
        # contract): each batch lands in its OWN batch-id-keyed
        # subdirectory with mode=overwrite, so a replayed micro-batch
        # overwrites its previous attempt instead of double-appending.
        # Readers use recursiveFileLookup (plain subdirs, no partition
        # inference — schema unchanged).
        #
        # Write FIRST, then assert on the written files (round 12,
        # VERDICT r11 #1): the batch result is computed exactly once —
        # by the sink write — and the exactly-once assert re-reads the
        # just-written parquet (a |batch|-sized scan) instead of either
        # recomputing the band join (round 10) or checkpointing the
        # whole result into executor storage (round 11, which the
        # driver measured SLOWER at this batch size).  A failed assert
        # still fails the trigger and the query; the replayed batch
        # overwrites its own sink subdirectory.
        pairs_path = os.path.join(out_dir, f"batch{bid}")
        pairs.write.mode("overwrite").parquet(pairs_path)
        bad = (
            spark.read.parquet(pairs_path)
            .filter(F.col("first_seen") != F.lit(int(bid)))
            .count()
        )
        if bad:
            raise AssertionError(
                f"stream batch {bid} emitted {bad} pairs whose later "
                "endpoint is not in this batch — emission is not "
                "exactly-once"
            )
        sig_new.write.mode("overwrite").parquet(
            os.path.join(sig_store, f"batch{bid}")
        )
        release_new_since(ledger_before)

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
        .writeStream.foreachBatch(handle)
        .option(
            "checkpointLocation", os.path.join(stage, "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


def _stream_lsh_batch_sql(col: str) -> str:
    from ..functions.hashing import portable_hash64_sql

    return (
        f"({portable_hash64_sql(f'cast({col} as varchar)', 'slsh')}"
        f" % {STREAM_LSH_BATCHES})"
    )


def stream_incremental_lsh_pairs_sql(threshold: float = 0.5) -> str:
    """Batch twin: the FULL LSH pair pipeline + the same first_seen
    provenance expression — stream emission must equal it exactly."""
    from ..operators.dedup import minhash_lsh_pairs_sql

    return f"""
    SELECT doc_a, doc_b, sig_match,
           cast(greatest({_stream_lsh_batch_sql('doc_a')},
                         {_stream_lsh_batch_sql('doc_b')}) as bigint)
             AS first_seen
    FROM ({minhash_lsh_pairs_sql(threshold)})
    """


STREAM_IVF_BATCHES = 3  # embeddings arrive as 3 hash-sliced micro-batches


def _stream_ivf_batch_flag(id_col: str = "vec_id"):
    from ..functions.hashing import portable_hash64

    return (
        portable_hash64(F.col(id_col).cast("string"), salt="sivf")
        % STREAM_IVF_BATCHES
    )


def _stream_ivf_batch_sql(col: str) -> str:
    from ..functions.hashing import portable_hash64_sql

    return (
        f"({portable_hash64_sql(f'cast({col} as varchar)', 'sivf')}"
        f" % {STREAM_IVF_BATCHES})"
    )


def stream_incremental_ivf_assign(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q233's IVF maintenance loop run as an ACTUAL stream (the q230
    discipline on the vector store): embeddings arrive in three
    hash-sliced micro-batches (staged files, ``maxFilesPerTrigger=1``,
    arrival order pinned by mtime).  The FIRST batch bootstraps the
    index — quantizer stats + seed centroids frozen on it and persisted
    to parquet stores (deterministic content, so a replayed bootstrap
    batch rewrites byte-identical stores: idempotent) — and EVERY batch
    is assigned to the persisted centroids read back from the store:
    O(|batch|·k) per trigger, the store never retrains mid-stream.
    Each batch's assignments land in a batch-id-keyed subdirectory with
    mode=overwrite (the idempotent-sink shape foreachBatch's
    exactly-once contract requires); the handler ASSERTS each emitted
    row's hash-slice equals its micro-batch id, making the plumbing
    self-checking.

    The accumulated emission across the drained stream equals the full
    batch assignment of the whole corpus under the batch-0-frozen
    quantizer — the DuckDB oracle is exactly that, so the driver
    hash-match proves stream == batch (the q209/q230 discipline).
    Output: (vec_id, cell, d2, arrived).

    Scale: per-trigger work is O(|batch|·k) with the centroid store as
    a broadcast-sized read; swap the staged-file source for Kafka and
    the parquet stores for a Delta table and this IS the production
    shape.  Reference anchor: ``hw3/hw3.py:125-172`` (extension — the
    reference has zero streaming and no vector index)."""
    import glob
    import os
    import shutil
    from ..staging import staging_dir

    from ..operators import similarity as SIM

    emb = spark.read.parquet(table_path(sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    stage = staging_dir(prefix="bdm_stream_ivf_")
    indir = os.path.join(stage, "in")
    stats_dir = os.path.join(stage, "stats_store")
    seed_dir = os.path.join(stage, "seed_store")
    out_dir = os.path.join(stage, "assign_out")
    os.makedirs(indir)
    bflag = _stream_ivf_batch_flag()
    _stage_batches(emb, bflag, STREAM_IVF_BATCHES, indir, stage)

    def handle(batch_df: DataFrame, bid: int) -> None:
        from ..checkpoints import (
            local_checkpoint,
            release_new_since,
            tracked_ids,
        )

        ledger_before = tracked_ids()
        if not glob.glob(os.path.join(stats_dir, "*.parquet")):
            # bootstrap trigger: freeze the quantizer on THIS batch and
            # persist it; the derivation is deterministic, so a replay
            # rewrites identical stores (idempotent)
            stats = local_checkpoint(
                SIM.ivf_quant_stats(batch_df), eager=False
            )
            seeds = local_checkpoint(
                SIM.ivf_seeds(batch_df, stats), eager=False
            )
            stats.write.mode("overwrite").parquet(stats_dir)
            seeds.write.mode("overwrite").parquet(seed_dir)
        assigned = SIM.ivf_assign(
            batch_df,
            spark.read.parquet(stats_dir),
            spark.read.parquet(seed_dir),
        ).withColumn("arrived", F.lit(int(bid)).cast("bigint"))
        # assert BEFORE the sink write, with no checkpoint (round 12,
        # VERDICT r11 #1 adjudication): the assert's count prunes the
        # plan to the slice column, so "recomputing" the assignment for
        # the write is cheaper than either checkpointing the result
        # (round 11 — driver-measured regression, interleaved A/B
        # 6.86 s vs 4.79 s plain) or writing first and re-reading
        # (A/B 5.09 s) — the centroid-assignment join is cheap per
        # trigger; only the expensive pair-join handlers (q230/q255)
        # keep the write-first shape
        bad = assigned.filter(
            _stream_ivf_batch_flag() != F.lit(int(bid))
        ).count()
        if bad:
            raise AssertionError(
                f"stream batch {bid} emitted {bad} assignments whose "
                "hash slice is not this batch — emission is not "
                "exactly-once"
            )
        assigned.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch{bid}")
        )
        release_new_since(ledger_before)

    q = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(stage, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


def stream_incremental_ivf_assign_sql() -> str:
    """Batch twin: the full corpus assigned under the batch-0-frozen
    quantizer, ``arrived`` = the hash-slice batch id — stream emission
    must equal it exactly."""
    from ..operators.similarity import _ivf_sql_core

    flag = _stream_ivf_batch_sql("vec_id")
    return (
        f"WITH {_ivf_sql_core(base_pred=f'{flag} = 0', src_item=f'cast({flag} as bigint) AS arrived')}\n"
        "    SELECT vec_id, cell, d2, arrived FROM assign"
    )


def stream_incremental_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q242's inverted-index maintenance run as an ACTUAL stream — the
    q230/q238 discipline on the lexical index, completing its
    arrival-shape matrix: documents arrive in the SAME three
    hash-sliced micro-batches as the streaming LSH job (salt "slsh" —
    one stream event feeds both index families), and a foreachBatch
    handler appends each batch's dl rows and term postings to persisted
    parquet stores, each batch in its own batch-id-keyed subdirectory
    with mode=overwrite (idempotent under micro-batch replay).  Only
    the arriving batch is ever tokenized; the handler ASSERTS each
    emitted posting's hash slice equals its micro-batch id.  After the
    drain, the fixed-term query runs off the accumulated stores — and
    must equal the full batch BM25 over the whole corpus, which is
    exactly the DuckDB oracle (+ an ``arrived`` provenance column =
    the doc's batch id).  Output: top-20 (doc_id, bm25, arrived).

    Scale: per-trigger work is O(|batch| tokens); the stores grow by
    |batch| rows per trigger and are never re-derived.  Kafka source +
    Delta stores is the same shape.  Reference anchor:
    ``FinalProject/BDM_Final.py`` TF-IDF (extension — the reference
    has zero streaming and no persisted index)."""
    import glob
    import os
    import shutil
    from ..staging import staging_dir

    from ..operators import lexical as LX

    docs = spark.read.parquet(table_path(sf_dir, "documents")).select(
        "doc_id", "text"
    )
    stage = staging_dir(prefix="bdm_stream_bm25_")
    indir = os.path.join(stage, "in")
    dl_store = os.path.join(stage, "dl_store")
    tf_store = os.path.join(stage, "tf_store")
    os.makedirs(indir)
    bflag = _stream_lsh_batch_flag()
    _stage_batches(docs, bflag, STREAM_LSH_BATCHES, indir, stage)

    def handle(batch_df: DataFrame, bid: int) -> None:
        from ..checkpoints import (
            local_checkpoint,
            release_new_since,
            tracked_ids,
        )

        ledger_before = tracked_ids()
        # consumed by BOTH index writes — one tokenization per trigger
        tok = local_checkpoint(LX._doc_tokens(batch_df), eager=False)
        # assert BEFORE the sink writes, with no checkpoint (round 12,
        # VERDICT r11 #1 adjudication): the slice asserts prune both
        # aggregations to the doc_id column, so the "double compute" is
        # cheaper than checkpointing both results (round 11 —
        # driver-measured regression, interleaved A/B 5.32 s vs 3.84 s
        # plain) or writing first and re-reading (A/B 4.67 s); the
        # token aggregations are cheap per trigger off the checkpointed
        # tok
        dl = LX._dl_from_tokens(tok)
        tf = LX._tf_from_tokens(tok)
        bad = (
            dl.filter(_stream_lsh_batch_flag() != F.lit(int(bid))).count()
            + tf.filter(_stream_lsh_batch_flag() != F.lit(int(bid))).count()
        )
        if bad:
            raise AssertionError(
                f"stream batch {bid} emitted {bad} index rows whose hash "
                "slice is not this batch — emission is not exactly-once"
            )
        dl.write.mode("overwrite").parquet(
            os.path.join(dl_store, f"batch{bid}")
        )
        tf.write.mode("overwrite").parquet(
            os.path.join(tf_store, f"batch{bid}")
        )
        release_new_since(ledger_before)

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(stage, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rd = lambda p: spark.read.option(  # noqa: E731
        "recursiveFileLookup", "true"
    ).parquet(p)
    return LX._bm25_from_stores(rd(dl_store), rd(tf_store)).select(
        "doc_id",
        "bm25",
        _stream_lsh_batch_flag().cast("bigint").alias("arrived"),
    )


def stream_incremental_bm25_sql() -> str:
    """Batch twin: the full BM25 over the whole corpus + the same
    arrived provenance — accumulated-store search must equal it."""
    from ..operators.lexical import _bm25_sql

    return (
        f"SELECT doc_id, bm25,"
        f" cast({_stream_lsh_batch_sql('doc_id')} as bigint) AS arrived"
        f" FROM ({_bm25_sql('TRUE')})"
    )


STREAM_TRI_BATCHES = 3  # orders arrive as 3 hash-sliced micro-batches


def _stream_tri_batch_flag(col: str = "l_orderkey"):
    from ..functions.hashing import portable_hash64

    return (
        portable_hash64(F.col(col).cast("string"), salt="stri")
        % STREAM_TRI_BATCHES
    )


def _stream_tri_batch_sql(col: str) -> str:
    from ..functions.hashing import portable_hash64_sql

    return (
        f"({portable_hash64_sql(f'cast({col} as varchar)', 'stri')}"
        f" % {STREAM_TRI_BATCHES})"
    )


def stream_incremental_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q246's triangle maintenance run as an ACTUAL stream — the
    q230/q238/q245 discipline on the graph family: orders arrive in
    three mtime-pinned micro-batches.  The FIRST batch bootstraps the
    stores (its full closure = that prefix graph's triangle counts;
    its edge set = the initial edge store); every later batch appends
    ONLY its truly-new edges to the store and emits its per-node delta
    counts via the shared attribution kernel
    (``graph._attributed_delta_counts`` — marked = this batch's new
    edges, graph = the accumulated edge set), each trigger writing to
    its own batch-id-keyed subdirectory with mode=overwrite (the
    idempotent foreachBatch sink; the handler also ASSERTS each row's
    order-hash slice equals its micro-batch id).  After the drain,
    per-node totals and the PER-TRIGGER breakdown (d0/d1/d2) read off
    the accumulated contribution store.

    The DuckDB oracle runs the full q110 pipeline over the three
    PREFIX graphs and emits d_k = prefix_k − prefix_{k-1} per node —
    so the driver hash-match proves not just stream totals == batch
    recompute but every individual trigger's delta attribution.
    Output: (node, deg, tri_cnt, d0, d1, d2).

    Scale: per-trigger work is O(|batch edges| · degree) intersection
    + store-sized anti-join; the corpus closure runs exactly once, on
    the bootstrap prefix.  Reference anchor: extension of q110 (the
    reference has zero streaming and no graphs)."""
    import glob
    import os
    import shutil
    from ..staging import staging_dir

    from ..operators import graph as GR

    li = spark.read.parquet(table_path(sf_dir, "lineitem")).select(
        "l_orderkey", "l_partkey"
    )
    stage = staging_dir(prefix="bdm_stream_tri_")
    indir = os.path.join(stage, "in")
    edge_store = os.path.join(stage, "edge_store")
    out_dir = os.path.join(stage, "contrib_out")
    os.makedirs(indir)
    bflag = _stream_tri_batch_flag()
    _stage_batches(li, bflag, STREAM_TRI_BATCHES, indir, stage)

    def handle(batch_df: DataFrame, bid: int) -> None:
        from ..checkpoints import (
            local_checkpoint,
            release_new_since,
            tracked_ids,
        )

        ledger_before = tracked_ids()
        bad = batch_df.filter(
            _stream_tri_batch_flag() != F.lit(int(bid))
        ).count()
        if bad:
            raise AssertionError(
                f"stream batch {bid} carries {bad} rows whose order-hash "
                "slice is not this batch — emission is not exactly-once"
            )
        batch_edges = local_checkpoint(
            GR._copurchase_pairs(batch_df), eager=False
        )
        if not glob.glob(os.path.join(edge_store, "*", "*.parquet")):
            # bootstrap trigger: this prefix graph's full closure —
            # derived FROM the checkpointed batch edges (the q250
            # store-derivation trick; no second pairing of the batch)
            contrib = GR.pairs_triangle_counts(batch_edges).select(
                "node", F.col("tri_cnt").alias("td")
            )
            new_edges = batch_edges
        else:
            store = spark.read.option("recursiveFileLookup", "true").parquet(
                edge_store
            )
            new_edges = local_checkpoint(
                batch_edges.join(store, ["pa", "pb"], "left_anti"),
                eager=False,
            )
            full_e = local_checkpoint(
                store.unionByName(new_edges), eager=False
            )
            contrib, _deg = GR._attributed_delta_counts(new_edges, full_e)
        contrib.withColumn("arrived", F.lit(int(bid)).cast("bigint")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"batch{bid}"))
        # only truly-new edges append, so the accumulated store stays a
        # distinct canonical edge SET
        new_edges.write.mode("overwrite").parquet(
            os.path.join(edge_store, f"batch{bid}")
        )
        release_new_since(ledger_before)

    q = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(stage, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rd = lambda p: spark.read.option(  # noqa: E731
        "recursiveFileLookup", "true"
    ).parquet(p)
    edges = rd(edge_store)
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionByName(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    contrib = rd(out_dir)
    bucket = lambda b: F.sum(  # noqa: E731
        F.when(F.col("arrived") == b, F.col("td")).otherwise(0)
    ).cast("long")
    return (
        contrib.groupBy("node")
        .agg(
            F.sum("td").cast("long").alias("tri_cnt"),
            bucket(0).alias("d0"),
            bucket(1).alias("d1"),
            bucket(2).alias("d2"),
        )
        .filter(F.col("tri_cnt") > 0)
        .join(deg, "node")
        .select("node", "deg", "tri_cnt", "d0", "d1", "d2")
    )


def stream_incremental_triangles_sql() -> str:
    """Batch twin: the full q110 pipeline over the three PREFIX graphs;
    d_k = prefix_k − prefix_{k-1} per node — stream emission must equal
    every per-trigger delta exactly."""
    from ..operators.graph import _tri_sql_pipeline

    flag = _stream_tri_batch_sql("l_orderkey")
    return f"""
    WITH {_tri_sql_pipeline(f"{flag} = 0", "_0")},
    {_tri_sql_pipeline(f"{flag} <= 1", "_1")},
    {_tri_sql_pipeline("TRUE", "_f")}
    SELECT f.node, d.deg, f.tri_cnt,
           cast(coalesce(p0.tri_cnt, 0) as bigint) AS d0,
           cast(coalesce(p1.tri_cnt, 0) - coalesce(p0.tri_cnt, 0) as bigint) AS d1,
           cast(f.tri_cnt - coalesce(p1.tri_cnt, 0) as bigint) AS d2
    FROM per_node_f f
    JOIN deg_f d ON d.node = f.node
    LEFT JOIN per_node_0 p0 ON p0.node = f.node
    LEFT JOIN per_node_1 p1 ON p1.node = f.node
    """


def stream_incremental_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q252's multimodal maintenance run as an ACTUAL stream (q255 —
    the q230/q238/q245/q248 discipline on the phash family, completing
    its arrival-shape matrix): documents arrive in the SAME three
    hash-sliced micro-batches as the streaming LSH/BM25 jobs (salt
    "slsh" — one crawl stream feeds all three index families), and a
    ``foreachBatch`` handler maintains the persisted state a production
    refresh would — ONLY the arriving batch's payloads run the
    Arrow-batched fingerprint kernel; the batch's signatures
    chunk-equi-join against accumulated-store ∪ batch for fresh pairs,
    and both stores grow by one batch-id-keyed subdirectory per trigger
    (mode=overwrite — idempotent under micro-batch replay, the
    foreachBatch exactly-once contract).  The handler ASSERTS each
    emitted pair's later endpoint arrived in THIS batch (exactly-once
    emission: a pair can only be discovered at its later endpoint's
    trigger, since the earlier endpoint was store-resident and
    store×store never re-joins).

    The drained pair store must equal the full batch q143 recompute
    with ``first_seen`` = greatest(endpoint batch ids) — exactly the
    DuckDB oracle, the stream == batch identity.  Output: (doc_a,
    doc_b, hamming, first_seen).

    Scale: per-trigger work is O(|batch| payload bytes) fingerprinting
    + a |batch|-sided chunk join; the signature store is read, never
    re-derived.  Kafka source + Delta stores is the same shape.
    Reference anchor: extension of q143 (the reference has zero
    streaming and no multimodal store)."""
    import glob
    import os
    import shutil

    from ..operators import multimodal as MM
    from ..staging import staging_dir

    docs = spark.read.parquet(table_path(sf_dir, "documents")).select(
        "doc_id", "text"
    )
    stage = staging_dir(prefix="bdm_stream_phash_")
    indir = os.path.join(stage, "in")
    sig_store = os.path.join(stage, "phash_store")
    out_dir = os.path.join(stage, "pairs_out")
    os.makedirs(indir)
    bflag = _stream_lsh_batch_flag()
    _stage_batches(docs, bflag, STREAM_LSH_BATCHES, indir, stage)

    def handle(batch_df: DataFrame, bid: int) -> None:
        from ..checkpoints import (
            local_checkpoint,
            release_new_since,
            tracked_ids,
        )

        ledger_before = tracked_ids()
        ph_new = local_checkpoint(
            MM.payload_phash(MM.with_binary_payload(batch_df)), eager=False
        )
        if glob.glob(os.path.join(sig_store, "*", "*.parquet")):
            ph_all = (
                spark.read.option("recursiveFileLookup", "true")
                .parquet(sig_store)
                .unionByName(ph_new)
            )
        else:
            ph_all = ph_new
        ph_all = local_checkpoint(ph_all, eager=False)
        d = MM._chunk_exploded(ph_new, "a")
        x = MM._chunk_exploded(ph_all, "b")
        pairs = (
            d.join(x, ["ci", "cv"])
            .filter(F.col("doc_a") != F.col("doc_b"))
            .select(
                F.least("doc_a", "doc_b").alias("pa"),
                F.greatest("doc_a", "doc_b").alias("pb"),
                MM._phash_hamming().alias("hamming"),
            )
            .filter(F.col("hamming") <= MM.PHASH_HAM_MAX)
            .select(
                F.col("pa").alias("doc_a"),
                F.col("pb").alias("doc_b"),
                "hamming",
            )
            .distinct()
            .withColumn(
                "first_seen",
                F.greatest(
                    _stream_lsh_batch_flag("doc_a"),
                    _stream_lsh_batch_flag("doc_b"),
                ).cast("bigint"),
            )
        )
        # write first, assert on the written files (round 12, VERDICT
        # r11 #1): the chunk join + hamming filter run exactly once —
        # in the sink write — and the exactly-once assert re-reads the
        # just-written parquet
        pairs_path = os.path.join(out_dir, f"batch{bid}")
        pairs.write.mode("overwrite").parquet(pairs_path)
        bad = (
            spark.read.parquet(pairs_path)
            .filter(F.col("first_seen") != F.lit(int(bid)))
            .count()
        )
        if bad:
            raise AssertionError(
                f"stream batch {bid} emitted {bad} pairs whose later "
                "endpoint is not in this batch — emission is not "
                "exactly-once"
            )
        ph_new.write.mode("overwrite").parquet(
            os.path.join(sig_store, f"batch{bid}")
        )
        release_new_since(ledger_before)

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(stage, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


def stream_incremental_phash_pairs_sql() -> str:
    """Batch twin: the FULL phash pair pipeline + the same first_seen
    provenance expression — stream emission must equal it exactly."""
    from ..operators.multimodal import phash_pairs_sql

    return f"""
    SELECT doc_a, doc_b, hamming,
           cast(greatest({_stream_lsh_batch_sql('doc_a')},
                         {_stream_lsh_batch_sql('doc_b')}) as bigint)
             AS first_seen
    FROM ({phash_pairs_sql()})
    """


def stream_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q257's OLAP-view maintenance run as an ACTUAL stream (q260 —
    the q230/q238/q245/q248/q255 discipline on the aggregate view):
    lineitem rows arrive in three order-sliced micro-batches (salt
    "sagv"), and the foreachBatch handler appends ONE partial-aggregate
    file set per trigger to the persisted view store (batch-id-keyed
    subdirectory, mode=overwrite — idempotent under micro-batch
    replay).  Partials are mergeable state: COUNT/SUM in exact decimals
    and per-partial MAX, so the store is append-only and the view is
    served by combine-on-read (the q261 vacuum compacts the accretion).
    The handler ASSERTS (a) every arriving row's hash slice equals the
    micro-batch id and (b) the partial conserves the batch's row count
    — partial-aggregation can drop or double nothing.

    After the drain, the combined store must equal the full batch
    rollup over the whole corpus with ``first_seen`` = the earliest
    micro-batch contributing to each group — exactly the DuckDB
    oracle (stream == batch).  Output: (ship_month, l_returnflag,
    n_rows, sum_qty, revenue, max_price, first_seen).

    Scale: per-trigger work is one |batch|-sized partial aggregate;
    the store grows by |touched groups| rows per trigger and the
    corpus is never re-rolled-up.  Kafka source + Delta store is the
    same shape.  Reference anchor: extension of
    ``hw2/BDM_hw2_final.py:203-206`` (the reference has zero
    streaming and no persisted view)."""
    import glob
    import os
    import shutil

    from ..operators import aggview as AV
    from ..sources.catalog import load_table
    from ..staging import staging_dir

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
        "l_shipdate",
    )
    stage = staging_dir(prefix="bdm_stream_aggview_")
    indir = os.path.join(stage, "in")
    store_dir = os.path.join(stage, "view_store")
    os.makedirs(indir)
    bflag = AV.stream_batch_flag()
    _stage_batches(li, bflag, AV.STREAM_AGV_BATCHES, indir, stage)
    schema = spark.read.parquet(os.path.join(indir, "batch0.parquet")).schema

    def handle(batch_df: DataFrame, bid: int) -> None:
        from ..checkpoints import (
            local_checkpoint,
            release_new_since,
            tracked_ids,
        )

        ledger_before = tracked_ids()
        rows = local_checkpoint(batch_df, eager=False)
        bad = rows.filter(AV.stream_batch_flag() != F.lit(int(bid))).count()
        if bad:
            raise AssertionError(
                f"stream batch {bid} received {bad} rows whose hash slice "
                "is not this batch — arrival slicing is broken"
            )
        partial = local_checkpoint(
            AV.agg_partials(rows).withColumn(
                "arrived", F.lit(int(bid)).cast("long")
            ),
            eager=False,
        )
        n_part = partial.agg(F.sum("n_rows")).collect()[0][0] or 0
        n_rows = rows.count()
        if n_part != n_rows:
            raise AssertionError(
                f"stream batch {bid} partial covers {n_part} rows of "
                f"{n_rows} arrived — partial aggregation lost rows"
            )
        partial.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch{bid}")
        )
        release_new_since(ledger_before)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(stage, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    parts = spark.read.option("recursiveFileLookup", "true").parquet(store_dir)
    served = AV.combine_partials(
        parts, F.min("arrived").cast("long").alias("first_seen")
    )
    return AV._as_output(served, "first_seen")


def stream_agg_view_sql() -> str:
    """Batch twin: the full rollup over the whole corpus + the same
    first_seen provenance — combine-on-read serving must equal it."""
    from ..operators.aggview import _view_aggs_sql, stream_batch_sql

    return f"""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           l_returnflag,{_view_aggs_sql()},
           cast(min({stream_batch_sql()}) as bigint) AS first_seen
    FROM lineitem
    GROUP BY 1, 2
    """


def stream_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q262's SCD2 MERGE run as an ACTUAL stream (q264): events arrive
    in three EVENT-TIME-ordered micro-batches (equal epoch-microsecond
    thirds of the fixture span — exact integer arithmetic, so the DuckDB
    twin derives the identical slicing), and each trigger MERGEs the
    arriving batch into the persisted history store via the q262
    merge-from-current-row step.  State is versioned PER BATCH ID
    (``store_v{bid}`` = merge(``store_v{bid-1}``, batch) — the
    functional state-chaining shape Structured Streaming's own state
    store uses): a replayed micro-batch recomputes its version from its
    predecessor and overwrites it, which is what makes a NON-idempotent
    operation (merge) idempotent under the foreachBatch replay contract
    — batch-id-keyed blind writes (the q230 pattern) would double-merge.
    The handler asserts per-trigger slice fidelity and the SCD2
    invariant (exactly one current row per batch user after the merge).

    After the drain, the LAST store version must equal the full q179
    recompute over all events, with ``arrived`` = the micro-batch that
    OPENED each version (a pure function of valid_from_us, so the
    DuckDB twin states it in closed form) — the stream == batch
    identity for chained stateful merges.

    Scale: per-trigger work is O(|batch| + |batch users|); history is
    never re-derived from events.  Kafka source + Delta MERGE INTO is
    the same shape.  Reference anchor: extends q179/q217/q262; the
    reference has zero streaming."""
    import glob
    import os
    import shutil

    from ..plans.queries import _q179_tier, _scd2_history, scd2_merge
    from ..sources.catalog import load_table
    from ..staging import staging_dir

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", _q179_tier().alias("tier")
    )
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    span = hi - lo + 1

    def bid_of(col):
        # exact integer division (`div`), matching DuckDB's `//`
        return F.least(
            F.lit(2),
            F.expr(f"(unix_micros({col}) - {lo}L) * 3L div {span}L"),
        )

    stage = staging_dir(prefix="bdm_stream_scd2_")
    indir = os.path.join(stage, "in")
    os.makedirs(indir)
    _stage_batches(ev, bid_of("ts"), 3, indir, stage)
    schema = spark.read.parquet(os.path.join(indir, "batch0.parquet")).schema

    def store_dir(v: int) -> str:
        return os.path.join(stage, f"store_v{v}")

    def handle(batch_df: DataFrame, bid: int) -> None:
        from ..checkpoints import (
            local_checkpoint,
            release_new_since,
            tracked_ids,
        )

        ledger_before = tracked_ids()
        rows = local_checkpoint(batch_df, eager=False)
        bad = rows.filter(bid_of("ts") != F.lit(int(bid))).count()
        if bad:
            raise AssertionError(
                f"stream batch {bid} received {bad} rows outside its "
                "event-time slice"
            )
        if bid == 0:
            merged = _scd2_history(rows)
        else:
            merged = scd2_merge(
                spark.read.parquet(store_dir(bid - 1)), rows
            ).drop("src")
        merged = local_checkpoint(merged, eager=False)
        n_cur = (
            merged.filter(F.col("is_current"))
            .join(rows.select("user_id").distinct(), "user_id", "left_semi")
            .count()
        )
        n_users = rows.select("user_id").distinct().count()
        if n_cur != n_users:
            raise AssertionError(
                f"stream batch {bid}: {n_cur} current rows for {n_users} "
                "batch users — the SCD2 invariant broke"
            )
        # state-version-per-batch: replay overwrites v{bid} recomputed
        # from v{bid-1} (idempotent even though merge itself is not)
        merged.write.mode("overwrite").parquet(store_dir(bid))
        release_new_since(ledger_before)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(stage, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = spark.read.parquet(store_dir(2))
    return final.select(
        "user_id",
        "version",
        "tier",
        "valid_from_us",
        "valid_to_us",
        "is_current",
        F.least(
            F.lit(2),
            F.expr(f"(valid_from_us - {lo}L) * 3L div {span}L"),
        ).alias("arrived"),
    )


def stream_scd2_merge_sql() -> str:
    """Batch twin: the full q179 history + arrived = the event-time
    third that opened each version — the chained stream merges must
    land exactly here."""
    return """
    WITH span AS (
      SELECT min(epoch_us(ts)) AS lo,
             max(epoch_us(ts)) - min(epoch_us(ts)) + 1 AS n FROM events
    ),
    e AS (
      SELECT user_id, event_id, ts,
             CASE WHEN value < 100 THEN 'low'
                  WHEN value < 500 THEN 'mid'
                  ELSE 'high' END AS tier
      FROM events),
    c AS (
      SELECT *, CASE WHEN lag(tier) OVER w IS NULL
                       OR lag(tier) OVER w <> tier THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    v AS (
      SELECT user_id, tier, ts,
             CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS version
      FROM c),
    g AS (
      SELECT user_id, version, min(tier) AS tier,
             min(epoch_us(ts)) AS valid_from_us
      FROM v GROUP BY 1, 2)
    SELECT user_id, version, tier, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
             AS valid_to_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
             IS NULL AS is_current,
           least(2, cast(((valid_from_us - span.lo) * 3) // span.n as bigint))
             AS arrived
    FROM g, span
    """


def stream_published_store(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """ATOMIC PUBLISH under STREAMING arrival (q275 — the q271
    protocol meeting the q230 arrival shape): documents arrive in three
    staged micro-batches and each trigger COMMITS a complete new
    signature-store version through the manifest pointer — version
    ``bid + 1`` is computed functionally from version ``bid`` read by
    EXPLICIT pin (``read_version``, never ``read_current``), so a
    replayed micro-batch recomputes and overwrites ITS OWN version
    instead of double-appending (q264's state-chaining discipline
    expressed in publish-protocol versions; Spark's foreachBatch
    exactly-once contract).  Readers between any two triggers resolve
    the pointer to a complete committed snapshot — never a
    half-ingested one.

    Per-trigger asserts: the pointer advanced to ``bid + 1`` and the
    committed version's row count equals the cumulative arrival —
    self-checking plumbing.  After the drain, serving runs the LSH
    pair pipeline off the pointer-resolved store; since the three
    batches partition the corpus, the result must equal the full-batch
    q26 recompute — the DuckDB oracle — plus the pinned final version
    (3), which reds the row if any trigger's flip was skipped.

    Scale: per-trigger work is O(|batch|) signing + one store-sized
    rewrite (at 100 TB the version write is an APPEND of the batch's
    files plus a manifest listing both, not a data rewrite — the
    pointer flip is identical); the serving read never sees partial
    state.  Reference anchor: ``hw3/hw3.py:125-172`` (extension — the
    reference has zero streaming and no versioning)."""
    import glob
    import os
    import shutil

    from ..operators import dedup as DD
    from ..sources.publish import (
        commit_version,
        current_version,
        publish_version,
        read_current,
        read_version,
        write_store_version,
    )
    from ..staging import staging_dir

    docs = spark.read.parquet(table_path(sf_dir, "documents")).select(
        "doc_id", "text"
    )
    stage = staging_dir(prefix="bdm_stream_publish_")
    indir = os.path.join(stage, "in")
    root = os.path.join(stage, "store_root")
    os.makedirs(indir)
    os.makedirs(root)
    bflag = _stream_lsh_batch_flag()
    _stage_batches(docs, bflag, STREAM_LSH_BATCHES, indir, stage)
    # arrival counts for the handler's cumulative audit — read from the
    # staged files' parquet footers (metadata-only), not a corpus re-scan
    counts = [
        spark.read.parquet(os.path.join(indir, f"batch{i}.parquet")).count()
        for i in range(STREAM_LSH_BATCHES)
    ]
    # v0: the committed EMPTY store — batch 0's functional predecessor
    publish_version(root, 0, {"sig": DD.minhash_signatures(docs.limit(0))})

    def handle(batch_df: DataFrame, bid: int) -> None:
        from ..checkpoints import release_new_since, tracked_ids

        ledger_before = tracked_ids()
        prev = read_version(spark, root, "sig", int(bid))
        write_store_version(
            prev.unionByName(DD.minhash_signatures(batch_df)),
            root,
            "sig",
            int(bid) + 1,
        )
        commit_version(root, int(bid) + 1)
        got = current_version(root)
        if got != int(bid) + 1:
            raise AssertionError(
                f"trigger {bid}: pointer at {got}, expected {int(bid) + 1}"
            )
        n = read_current(spark, root, "sig").count()
        expect = sum(counts[: int(bid) + 1])
        if n != expect:
            raise AssertionError(
                f"trigger {bid}: committed store has {n} signatures, "
                f"cumulative arrival is {expect}"
            )
        release_new_since(ledger_before)

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(stage, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ver = current_version(root)
    sig = read_current(spark, root, "sig")
    return DD.lsh_candidate_pairs(sig, threshold).withColumn(
        "published_version", F.lit(ver).cast("long")
    )


def stream_published_store_sql(threshold: float = 0.5) -> str:
    """Batch twin: the full-corpus LSH pair recompute (the three
    micro-batches partition the corpus) + the pinned final committed
    version."""
    from ..operators.dedup import minhash_lsh_pairs_sql

    return (
        f"SELECT doc_a, doc_b, sig_match,"
        f" cast({STREAM_LSH_BATCHES} as bigint) AS published_version"
        f" FROM ({minhash_lsh_pairs_sql(threshold)})"
    )


def stream_session_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q282's session merge run as an ACTUAL stream (q284): events
    arrive in three EVENT-TIME-ordered micro-batches (equal
    epoch-microsecond thirds of the fixture span, exact integer
    arithmetic — the q264 slicing), and each trigger merges the
    arriving batch into the persisted session store via the q282
    merge-from-final-session step.  State is versioned PER BATCH ID
    (``store_v{bid}`` = merge(``store_v{bid-1}``, batch) — the q264
    functional state-chaining shape), so a replayed micro-batch
    recomputes its version from its predecessor and overwrites it:
    the non-idempotent merge becomes idempotent under the foreachBatch
    replay contract.  The handler asserts per-trigger slice fidelity
    and the frontier invariant (after the merge, the store's latest
    session ends exactly one gap after the batch's latest event).

    After the drain, the final store must equal the full
    sessionization recompute, with ``arrived`` = the micro-batch that
    LAST TOUCHED each session (a pure function of the session's final
    event time, so the DuckDB twin states it in closed form) — the
    stream == batch identity for chained session merges, including
    sessions EXTENDED ACROSS trigger boundaries (a batch-1 event
    within one gap of a batch-0 session's end grows that session in
    place; the recompute cannot tell).

    Scale: per-trigger work is O(|batch| + |batch users|); earlier
    sessions are never re-derived.  Kafka source + an upsert sink is
    the same production shape.  Reference anchor: extends q190/q282;
    the reference has zero streaming."""
    import glob
    import os
    import shutil

    from ..operators.sessions import (
        GAP_US,
        full_sessions_derived,
        merge_sessions_step,
    )
    from ..sources.catalog import load_table
    from ..staging import staging_dir

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    span = hi - lo + 1

    def bid_of(col):
        # exact integer division (`div`), matching DuckDB's `//`
        return F.least(
            F.lit(2),
            F.expr(f"(unix_micros({col}) - {lo}L) * 3L div {span}L"),
        )

    stage = staging_dir(prefix="bdm_stream_sessions_")
    indir = os.path.join(stage, "in")
    os.makedirs(indir)
    _stage_batches(ev, bid_of("ts"), 3, indir, stage)
    schema = spark.read.parquet(os.path.join(indir, "batch0.parquet")).schema

    def store_dir(v: int) -> str:
        return os.path.join(stage, f"store_v{v}")

    def handle(batch_df: DataFrame, bid: int) -> None:
        from ..checkpoints import (
            local_checkpoint,
            release_new_since,
            tracked_ids,
        )

        ledger_before = tracked_ids()
        rows = local_checkpoint(batch_df, eager=False)
        bad = rows.filter(bid_of("ts") != F.lit(int(bid))).count()
        if bad:
            raise AssertionError(
                f"stream batch {bid} received {bad} rows outside its "
                "event-time slice"
            )
        batch_rows = rows.select(
            "user_id", F.unix_micros("ts").alias("tus"), "event_id"
        )
        if bid == 0:
            merged = full_sessions_derived(rows)
        else:
            merged = merge_sessions_step(
                spark.read.parquet(store_dir(bid - 1)), batch_rows
            ).drop("src")
        merged = local_checkpoint(merged, eager=False)
        # frontier invariant: the latest stored session ends exactly
        # one gap after the batch's latest event (1-row control scalars)
        mx_end = merged.agg(F.max("session_end_us")).collect()[0][0]
        mx_tus = rows.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
        if mx_end != mx_tus + GAP_US:
            raise AssertionError(
                f"stream batch {bid}: store frontier {mx_end} != batch "
                f"max {mx_tus} + gap"
            )
        # state-version-per-batch: replay overwrites v{bid} recomputed
        # from v{bid-1} (idempotent even though merge itself is not)
        merged.write.mode("overwrite").parquet(store_dir(bid))
        release_new_since(ledger_before)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(stage, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = spark.read.parquet(store_dir(2))
    arrived = F.least(
        F.lit(2).cast("long"),
        F.expr(
            f"(session_end_us - {GAP_US}L - {lo}L) * 3L div {span}L"
        ),
    )
    return final.select(
        "user_id",
        "session_start_us",
        "session_end_us",
        "n_events",
        arrived.cast("long").alias("arrived"),
    )


def stream_session_merge_sql() -> str:
    """Batch twin: the full sessionization recompute + the closed-form
    last-touching micro-batch id."""
    from ..operators.sessions import GAP_US

    return f"""
    WITH b AS (
      SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
    ),
    g AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ),
    sess AS (
      SELECT user_id,
             min(tus) AS session_start_us,
             max(tus) + {GAP_US} AS session_end_us,
             count(*) AS n_events
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id, session_start_us, session_end_us, n_events,
           least(2, (session_end_us - {GAP_US} - lo) * 3 // (hi - lo + 1))
             AS arrived
    FROM sess, b
    """
