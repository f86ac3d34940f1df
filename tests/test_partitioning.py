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


def test_dynamic_partition_pruning_fires_on_dim_filtered_join(spark, tmp_path_factory):
    """Dynamic partition pruning: when the partition-key predicate only
    EXISTS at runtime (a filter on a non-join dim attribute, so nothing
    is statically pushable to the fact side), Spark must inject a
    ``dynamicpruningexpression`` into the fact scan's PartitionFilters —
    at 100 TB this is what turns a star join against a filtered
    dimension into a scan of just the matching hive partitions. The
    stats heuristic is relaxed for the session (like the bloom-filter
    capability pin) because at fixture scale the estimated benefit never
    clears the bar; the assertion is that our layout + join shape are
    DPP-ELIGIBLE (join on the partition column, selective literal
    predicate on the dim, broadcast reuse), which a wrapped join key or
    non-partition layout would silently break.

    Note the static-pruning trap this test dodges: filtering the dim on
    the JOIN column itself lets constraint propagation push a STATIC
    partition filter, and DPP never needs to fire."""
    out = tmp_path_factory.mktemp("dpp")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    sinks.write_parquet(ev, str(out / "fact"), partition_by=["event_type"])
    (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "category",
            F.when(F.col("event_type") == "error", "failure").otherwise("normal"),
        )
        .write.mode("overwrite")
        .parquet(str(out / "dim"))
    )
    old = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try:
        fact = spark.read.parquet(str(out / "fact"))
        dim = spark.read.parquet(str(out / "dim")).filter(
            F.col("category") == "failure"
        )
        j = fact.join(F.broadcast(dim), "event_type").groupBy("event_type").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruningexpression(event_type" in plan, plan[:2000]
        rows = j.collect()
        assert [r["event_type"] for r in rows] == ["error"]
        assert rows[0]["count"] == ev.filter("event_type = 'error'").count()
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.useStats", old
        )
