"""SparkSession factory.

The reference scripts each build ad-hoc sessions with default confs
(e.g. ``hw2/BDM_hw2_final.py:12-14``, ``FinalProject/BDM_Final.py:60-66``).
Here a single factory pins the confs that matter for correctness
(UTC session timezone so timestamp hashing is engine-independent) and for
scale (AQE on, Arrow on, sane shuffle partitioning).

Scale notes (100 TB design target):
  - AQE handles runtime partition coalescing + skew-join splitting, so the
    static ``spark.sql.shuffle.partitions`` only needs to be an upper bound;
    on a real cluster set it ~2-3x total cores and let AQE coalesce.
  - ``autoBroadcastJoinThreshold`` is raised to 64m: every dimension table in
    the star schema (region/nation/customer/supplier/part) stays broadcast
    even at large SF, keeping fact-table joins shuffle-free on one side.
  - ``maxPartitionBytes`` 128m keeps scan tasks right-sized for 100 TB of
    parquet (~800k tasks at 128m — fine for a 1000-executor cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs applied to every session. Values chosen for the local[32] test rig
#: but safe on a cluster; override via ``extra_conf`` or spark-submit.
DEFAULT_CONFS: dict[str, str] = {
    # correctness
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    # the events fixture stores TIMESTAMP(NANOS) which Spark's vectorized
    # reader rejects; read as bigint nanos, converted in the catalog loader
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for toPandas()/createDataFrame/pandas_udf boundaries
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # adaptive execution: runtime coalesce, skew-join split, dynamic broadcast
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # shuffle sizing for local[32]; on a cluster: ~2-3x total cores
    "spark.sql.shuffle.partitions": "32",
    # keep star-schema dimensions broadcastable
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # scan task sizing
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # faster shuffles of non-row payloads
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
    # local mode: driver == executor; Spark's 1g default OOMs on join-heavy
    # workloads long before the 128 GiB test rig is touched. Builder-time
    # conf only — spark-submit/cluster managers override it.
    "spark.driver.memory": "8g",
}


#: SQL confs that affect CORRECTNESS (not just performance). These must hold
#: even when the caller hands us a session we didn't build (the driver's
#: verify constructs its own vanilla SparkSession) — all are runtime-settable.
RUNTIME_CRITICAL_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    "spark.sql.adaptive.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Idempotently pin correctness-critical confs on an existing session."""
    for k, v in RUNTIME_CRITICAL_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)
    return spark


def get_spark(
    app_name: str = "bigdatamining_graduate_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the same code runs unchanged under spark-submit on a cluster where
    ``master`` is supplied externally (pass ``master=None`` and set
    MASTER via spark-submit).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
