"""Semantic edge tests for the closing TPC-H sweep (q160/q161) on a
hand-built mini-fixture: the behaviors the sf-fixture oracle exercises
only statistically — q161's tie preservation and q160's three exclusion
rules — pinned on constructed rows where the expected output is known by
inspection."""

from __future__ import annotations

import datetime as dt

from bigdatamining_graduate_spark.plans.queries import QUERIES
from bigdatamining_graduate_spark.sources.catalog import SCHEMAS


def _write_fixture(spark, tmp_path, lineitem, orders, suppliers):
    """Materialize full-schema parquet tables under tmp_path so
    load_table() reads them like any sf_dir."""
    sf_dir = str(tmp_path)
    rows = {
        "lineitem": [
            # (orderkey, partkey, suppkey, linenumber, qty, price, disc,
            #  tax, returnflag, linestatus, shipdate)
            (ok, 1, sk, ln, 1.0, price, disc, 0.0, "N", "O", ship)
            for (ok, sk, ln, price, disc, ship) in lineitem
        ],
        "orders": [
            # (orderkey, custkey, status, totalprice, orderdate, priority)
            (ok, 1, status, 100.0, od, "1-URGENT")
            for (ok, status, od) in orders
        ],
        "supplier": [(sk, name, 1, 100.0) for (sk, name) in suppliers],
    }
    for name, data in rows.items():
        spark.createDataFrame(data, SCHEMAS[name]).write.mode("overwrite").parquet(
            f"{sf_dir}/{name}.parquet"
        )
    return sf_dir


def test_q160_exclusion_rules(spark, tmp_path):
    """Only order A qualifies: multi-supplier, finished, EXACTLY ONE late
    supplier. B (both late), C (single-supplier), and D (status O) are
    each excluded by a different rule."""
    base = dt.datetime(1998, 1, 1)
    late = base + dt.timedelta(days=120)
    ontime = base + dt.timedelta(days=10)
    sf_dir = _write_fixture(
        spark,
        tmp_path,
        lineitem=[
            (100, 1, 1, 10.0, 0.0, late),    # A: s1 late
            (100, 2, 2, 10.0, 0.0, ontime),  # A: s2 on time
            (200, 1, 1, 10.0, 0.0, late),    # B: both late -> excluded
            (200, 2, 2, 10.0, 0.0, late),
            (300, 1, 1, 10.0, 0.0, late),    # C: single supplier -> excluded
            (400, 1, 1, 10.0, 0.0, late),    # D: status O -> excluded
            (400, 2, 2, 10.0, 0.0, ontime),
        ],
        orders=[
            (100, "F", base),
            (200, "F", base),
            (300, "F", base),
            (400, "O", base),
        ],
        suppliers=[(1, "S1"), (2, "S2")],
    )
    rows = QUERIES["q160_waiting_supplier"](spark, sf_dir).collect()
    assert [(r["s_name"], r["numwait"]) for r in rows] == [("S1", 1)]


def test_q160_counts_orders_not_lines(spark, tmp_path):
    """Two late LINES by the same supplier in one order are one waiting
    order — the per-order aggregation dedups before counting."""
    base = dt.datetime(1998, 1, 1)
    late = base + dt.timedelta(days=120)
    ontime = base + dt.timedelta(days=10)
    sf_dir = _write_fixture(
        spark,
        tmp_path,
        lineitem=[
            (100, 1, 1, 10.0, 0.0, late),
            (100, 1, 2, 10.0, 0.0, late),    # second late line, same supplier
            (100, 2, 3, 10.0, 0.0, ontime),
        ],
        orders=[(100, "F", base)],
        suppliers=[(1, "S1"), (2, "S2")],
    )
    rows = QUERIES["q160_waiting_supplier"](spark, sf_dir).collect()
    assert [(r["s_name"], r["numwait"]) for r in rows] == [("S1", 1)]


def test_q161_preserves_ties(spark, tmp_path):
    """Two suppliers with bit-identical quarterly revenue are BOTH
    returned (the reason this is a scalar-max equality, not LIMIT 1);
    the lower-revenue supplier is excluded, as is revenue shipped
    outside the quarter."""
    inq = dt.datetime(1998, 2, 1)
    outq = dt.datetime(1998, 6, 1)
    sf_dir = _write_fixture(
        spark,
        tmp_path,
        lineitem=[
            (100, 1, 1, 100.0, 0.0, inq),
            (200, 2, 1, 100.0, 0.0, inq),    # s2 ties s1 exactly
            (300, 3, 1, 50.0, 0.0, inq),     # s3 lower -> excluded
            (400, 3, 2, 900.0, 0.0, outq),   # s3 out-of-window -> ignored
        ],
        orders=[(100, "F", inq), (200, "F", inq), (300, "F", inq), (400, "F", outq)],
        suppliers=[(1, "S1"), (2, "S2"), (3, "S3")],
    )
    rows = QUERIES["q161_top_revenue_suppliers"](spark, sf_dir).collect()
    assert [(r["s_suppkey"], r["s_name"], r["total_revenue"]) for r in rows] == [
        (1, "S1", 100.0),
        (2, "S2", 100.0),
    ]
