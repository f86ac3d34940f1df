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


def test_q167_roundtrip_join_is_shuffle_free(spark):
    """q167's whole point, asserted on its executed plan: the bucketed
    write pays the shuffle once, so the read-back orders⋈lineitem SMJ
    runs with ZERO exchange below the join — the only Exchange in the
    plan is the final single-key groupBy. Values are covered by the
    oracle (driver window + parity test); this pins the physical
    property that makes it the 100 TB strategy."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES

    df = QUERIES["q167_bucketed_join_roundtrip"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "SortMergeJoin" in plan
    below_join = plan[plan.find("SortMergeJoin"):]
    assert "Exchange hashpartitioning" not in below_join, below_join


def test_unbucketed_join_needs_exchange_or_broadcast(warehouse):
    from bigdatamining_graduate_spark.sources.catalog import load_table

    spark = warehouse
    sf = "/root/testdata/sf0.001"
    od = load_table(spark, sf, "orders").hint("merge")
    li = load_table(spark, sf, "lineitem")
    plan = _plan(li.join(od, li.l_orderkey == od.o_orderkey))
    assert "Exchange" in plan  # the cost bucketing removes


def test_zorder_roundtrip_layout_prunes(spark):
    """q165's pruning payoff, measured on the files it writes: after
    ``zorder_write`` on (ux, hy), every output file must carry a tight
    per-dimension bounding box (that IS the min/max statistic a
    data-skipping reader consults), and the q165 predicate box
    (ux 3-6 x hy 9-12) must intersect only a minority of files — i.e.
    a stats-based scan skips most of the data. A random (hash) layout
    puts every (ux, hy) combination in every file, so bboxes cover the
    full domain and nothing prunes; a sort by ux alone prunes ux but
    not hy. The Morton interleave is what buys BOTH dims at once."""
    import pyspark.sql.functions as F

    from bigdatamining_graduate_spark.plans.queries import (
        _Q165_HY,
        _Q165_UX,
        _q165_dir,
        QUERIES,
    )

    q165 = QUERIES["q165_zorder_roundtrip"](spark, "/root/testdata/sf0.01")
    # both range predicates reach the parquet scan as data-source filters
    # (what row-group min/max skipping keys off) — not post-scan Filters
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = q165._jdf.queryExecution().explainString(mode)
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    for frag in ("GreaterThanOrEqual(ux,", "LessThanOrEqual(ux,",
                 "GreaterThanOrEqual(hy,", "LessThanOrEqual(hy,"):
        assert frag in pushed, pushed
    q165.count()
    back = spark.read.parquet(f"{_q165_dir()}/sf0.01")
    boxes = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("ux").alias("ux0"), F.max("ux").alias("ux1"),
            F.min("hy").alias("hy0"), F.max("hy").alias("hy1"),
        )
        .collect()
    )
    assert len(boxes) >= 8  # the 16-way range partitioning materialized
    domain = 32 * 24
    areas = [(b.ux1 - b.ux0 + 1) * (b.hy1 - b.hy0 + 1) for b in boxes]
    # tight boxes: on average a file covers a small slice of the domain
    assert sum(areas) / len(areas) <= domain / 3, areas
    hit = [
        b
        for b in boxes
        if b.ux0 <= _Q165_UX[1] and b.ux1 >= _Q165_UX[0]
        and b.hy0 <= _Q165_HY[1] and b.hy1 >= _Q165_HY[0]
    ]
    # the selective predicate touches a minority of files -> real skipping
    assert len(hit) <= len(boxes) / 2, (len(hit), len(boxes))
