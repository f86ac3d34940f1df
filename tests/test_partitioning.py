"""Partitioned-parquet layout + partition pruning: the 100 TB scan story.

Writing facts hive-partitioned by a coarse time key means a date-bounded
query never touches irrelevant files — the `PartitionFilters` line in the
scan (vs `PushedFilters`, which still reads every file's footer). This is
the layout `sources.sinks.write_parquet(partition_by=...)` produces.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatamining_graduate_spark.sources import sinks
from bigdatamining_graduate_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part") / "events_by_day")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    sinks.write_parquet(ev, out, partition_by=["day"])
    return out


def test_partition_pruning_in_plan(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(
        F.col("day") == "2024-01-05"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    # the day predicate prunes at the FILE level, not per-row
    n_all = spark.read.parquet(partitioned_events).count()
    n_day = df.count()
    assert 0 < n_day < n_all


def test_partitioned_roundtrip_complete(spark, partitioned_events):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    back = spark.read.parquet(partitioned_events)
    assert back.count() == ev.count()
    # every original event id survives the partitioned rewrite
    assert back.select("event_id").distinct().count() == ev.count()
