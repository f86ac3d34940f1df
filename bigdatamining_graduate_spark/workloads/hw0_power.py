"""hw0 parity: UCI Household Power Consumption column statistics.

Reference: three scripts, 11 RDD jobs total (``hw0/hw0_1.py:10-32``,
``hw0/hw0_2.py:42-62``, ``hw0/hw0_3.py:30-49``) with hand-rolled '?'
sentinel filtering (P15). Here: one permissive-schema CSV scan (the '?'
tokens become NULLs — no sentinel dance), ONE aggregate job for every
statistic, and a broadcast-bounds normalize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.readers import read_delimited

#: FIXTURES.md §1.1 — ; -separated, headered; numeric fields carry '?'
POWER_SCHEMA = T.StructType(
    [
        T.StructField("Date", T.StringType()),
        T.StructField("Time", T.StringType()),
        T.StructField("Global_active_power", T.DoubleType()),
        T.StructField("Global_reactive_power", T.DoubleType()),
        T.StructField("Voltage", T.DoubleType()),
        T.StructField("Global_intensity", T.DoubleType()),
        T.StructField("Sub_metering_1", T.DoubleType()),
        T.StructField("Sub_metering_2", T.DoubleType()),
        T.StructField("Sub_metering_3", T.DoubleType()),
    ]
)

NUMERIC_COLS = [
    "Global_active_power",
    "Global_reactive_power",
    "Voltage",
    "Global_intensity",
]


def load(spark: SparkSession, path: str) -> DataFrame:
    """Permissive read: '?' sentinels parse to NULL (replaces the
    parse-error → -1.0 → filter dance at ``hw0/hw0_1.py:13-27``)."""
    df = read_delimited(spark, path, POWER_SCHEMA, sep=";", header=True)
    # whole-row rejection like the reference: any unparseable metric drops
    # the row, keeping per-column counts equal (FIXTURES.md §3)
    cond = None
    for c in NUMERIC_COLS:
        p = F.col(c).isNotNull()
        cond = p if cond is None else (cond & p)
    return df.filter(cond)


def column_stats(df: DataFrame) -> DataFrame:
    """min/max/count/mean/stddev_pop for every metric — ONE job (vs 11).
    ``stddev_pop`` matches RDD ``stdev()`` (SURVEY.md §7.4 risk 1)."""
    aggs = []
    for c in NUMERIC_COLS:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.avg(c).alias(f"{c}_mean"),
            F.stddev_pop(c).alias(f"{c}_stddev"),
        ]
    return df.agg(F.count("*").alias("row_count"), *aggs)


def minmax_normalized(df: DataFrame) -> DataFrame:
    """(x - min) / (max - min) per metric (``hw0/hw0_3.py:43-46``) via a
    broadcast 1-row bounds aggregate — no per-column jobs, no window."""
    bounds = df.agg(
        *[f for c in NUMERIC_COLS for f in (F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max"))]
    )
    out = df.crossJoin(F.broadcast(bounds))
    exprs = [
        ((F.col(c) - F.col(f"{c}_min")) / (F.col(f"{c}_max") - F.col(f"{c}_min"))).alias(
            f"{c}_norm"
        )
        for c in NUMERIC_COLS
    ]
    return out.select("Date", "Time", *exprs)
