"""Bucketed-table co-location: the 100 TB join strategy.

At scale, the orders⋈lineitem edge is the one join that can't broadcast.
Writing both sides bucketed by the join key lets Spark sort-merge-join
them with ZERO exchange — the shuffle happens once at write time and is
amortized over every subsequent join. This test proves the property on
the engine's plans: same-bucketed join has no Exchange; the plain
parquet join does.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    from bigdatamining_graduate_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    od = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    (
        od.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(warehouse):
    spark = warehouse
    # hint("merge"): at fixture scale the planner prefers broadcast (which
    # bypasses bucketing entirely); at 100 TB neither side broadcasts and
    # SMJ is what the planner picks — the hint simulates that regime
    j = spark.table("lineitem_b").join(
        spark.table("orders_b").hint("merge"),
        spark.table("lineitem_b").l_orderkey == spark.table("orders_b").o_orderkey,
    )
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan  # co-located: no shuffle
    assert j.count() == 6000


def test_unbucketed_join_needs_exchange_or_broadcast(warehouse):
    from bigdatamining_graduate_spark.sources.catalog import load_table

    spark = warehouse
    sf = "/root/testdata/sf0.001"
    od = load_table(spark, sf, "orders").hint("merge")
    li = load_table(spark, sf, "lineitem")
    plan = _plan(li.join(od, li.l_orderkey == od.o_orderkey))
    assert "Exchange" in plan  # the cost bucketing removes
