"""Binned interval (range) join — an operator class the reference never
had (SURVEY.md §2.3 note: "no range/as-of/interval joins") but any
event-pipeline engine needs: join each left row to right rows whose
timestamp falls in a bounded window around the left timestamp, on an
equality key.

The naive plan is an inequality theta-join — Catalyst can only execute
that as BroadcastNestedLoopJoin (O(|L|·|R|) comparisons), the same scale
blocker as the reference's all-pairs similarity join (``hw4/hw4.py:
104-110``). The classic distributed rewrite, used here: quantize time
into fixed-width bins at least as wide as the window span, equi-join on
(key, bin) — each left row probes at most 2 adjacent bins — then apply
the exact interval predicate as a post-join filter. The join becomes a
plain shuffle-hash/sort-merge equi-join partitioned by (key, bin):
shuffle volume O(|L| + |R|), per-task work bounded by bin occupancy, AQE
skew-split applies if one (key, bin) is hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US = 1_000_000


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Inner-join ``right`` rows with ``right_ts`` in the half-open window
    ``[left_ts + lower_s, left_ts + upper_s)`` of each ``left`` row,
    matching on ``keys``. Apart from ``keys``, column names must be
    disjoint between the two inputs (pre-select/rename at the call site).

    Bin width = window span, so every left row expands to at most 2
    (key, bin) probe rows regardless of data volume.
    """
    span_us = (upper_s - lower_s) * US
    if span_us <= 0:
        raise ValueError("upper_s must be > lower_s")
    lo = F.unix_micros(F.col(left_ts)) + lower_s * US
    hi = F.unix_micros(F.col(left_ts)) + upper_s * US
    l = (
        left.withColumn("__lo_us", lo)
        .withColumn("__hi_us", hi)
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("__lo_us") / span_us),
                    # hi is exclusive: the bin containing (hi - 1)
                    F.floor((F.col("__hi_us") - 1) / span_us),
                )
            ),
        )
    )
    r = right.withColumn("__rts_us", F.unix_micros(F.col(right_ts))).withColumn(
        "__bin", F.floor(F.col("__rts_us") / span_us)
    )
    return (
        l.join(r, [*keys, "__bin"])
        .filter((F.col("__rts_us") >= F.col("__lo_us")) & (F.col("__rts_us") < F.col("__hi_us")))
        .drop("__bin", "__lo_us", "__hi_us", "__rts_us")
    )
