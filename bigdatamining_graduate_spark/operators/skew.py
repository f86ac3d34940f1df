"""Skew-safe aggregation via salting — the 100 TB defense the reference
never needed at course scale.

A hot group key (one user generating 10% of all events) concentrates a
shuffle partition on one task. Two-stage salted aggregation splits every
hot key across ``n_salts`` reducers, then combines the partials:

    stage 1: groupBy(key, salt)   — hot key spread over n_salts tasks
    stage 2: groupBy(key)         — n_salts partial rows per key

AQE's skew handling (``spark.sql.adaptive.skewJoin``) covers JOIN skew at
runtime; aggregation skew is mostly absorbed by map-side partial
aggregation, but high-cardinality-accumulator aggs (collect_list,
count-distinct-style) still need explicit salting — this operator is the
template, with a deterministic salt so results are reproducible and
oracle-checkable (the result is algebraically identical to the direct
groupBy; the oracle IS the plain GROUP BY).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_SALTS = 16


def salted_sum_count(
    df: DataFrame,
    key: str,
    value: Column,
    salt_source: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Two-stage (sum, count) per ``key``. ``salt_source`` is any
    roughly-uniform deterministic column (an id) — ``pmod(id, n)`` beats
    ``rand()`` because reruns and oracles agree."""
    salt = F.pmod(F.col(salt_source), F.lit(n_salts)).alias("_salt")
    partial = (
        df.groupBy(F.col(key), salt)
        .agg(F.sum(value).alias("_psum"), F.count("*").alias("_pcnt"))
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").alias("value_sum"), F.sum("_pcnt").alias("n")
    )
