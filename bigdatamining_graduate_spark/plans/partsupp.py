"""Deterministically derived ``partsupp`` — completes the TPC-H surface.

The fixture schema has no ``partsupp`` table, which SURVEY.md §8 recorded
as making TPC-H Q2/Q9/Q11/Q20 inexpressible. But nothing about those
query SHAPES (correlated argmin, global-threshold HAVING, semi-join
chains, multi-star profit rollups) needs TPC-H's random data — only a
(part, supplier) relation both engines agree on. So we DERIVE one from
``part`` × ``supplier`` with pure integer arithmetic, generated here as
twinned Spark/SQL builders from the SAME constants so the two engines can
never drift (the ``plans.numerics`` discipline):

    ps_suppkey    = (p_partkey*7 + i*13) mod S,  i in 0..PS_PER_PART-1
    ps_availqty   = 1 + (p_partkey*37 + ps_suppkey*11) mod 9999
    ps_supplycost = ((p_partkey*31 + ps_suppkey*17) mod 90000 + 10000)/100

``S`` = supplier count, computed from the table (never hard-coded, so
every SF works). All inputs are non-negative, so ``%`` agrees across
engines; supplycost carries exactly 2 decimal digits, so the
``decimal(20,2)`` exact-sum path stays lossless. Keys are 0-based
contiguous in the fixture (verified sf0.001/0.01/0.1), so the mod keeps
ps_suppkey inside the supplier domain; the i-multiplier 13 gives 4
distinct suppliers per part at every fixture S (13·d mod S ≠ 0 for
d≤3), and even a collision would be mirrored identically by both
builders.

Scale: the derived relation is |part|×4 rows built from a broadcast
1-row supplier count — no shuffle; at 100 TB a real partsupp would
simply be read instead, and every query in the q171+ family keeps the
same plan shape (the derivation is a stand-in scan, not a trick).

Reference parity: the reference's TPC-H homework (hw4) runs the full
22-query sweep on real partsupp; this module re-opens the four queries
the fixture schema had closed (SURVEY.md §2 rows J1/A6, §8 gap note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PS_PER_PART = 4

# (multiplier pairs kept tiny: max intermediate ~ p_partkey*37, far inside
# BIGINT at any SF)
_SUPP_A, _SUPP_B = 7, 13
_QTY_A, _QTY_B, _QTY_MOD = 37, 11, 9999
_COST_A, _COST_B, _COST_MOD, _COST_BASE = 31, 17, 90000, 10000


def derived_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost) — 4 suppliers
    per part. The supplier count rides in as a broadcast 1-row aggregate
    (the engine's standing pattern for scalar plan constants)."""
    n_supp = supplier.agg(F.count("*").alias("n_supp"))
    gen = (
        part.select("p_partkey")
        .crossJoin(F.broadcast(n_supp))
        .select(
            "p_partkey",
            F.explode(
                F.sequence(F.lit(0), F.lit(PS_PER_PART - 1))
            ).alias("i"),
            "n_supp",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (
                (F.col("p_partkey") * _SUPP_A + F.col("i") * _SUPP_B)
                % F.col("n_supp")
            ).alias("ps_suppkey"),
        )
    )
    return gen.select(
        "ps_partkey",
        "ps_suppkey",
        (
            F.lit(1)
            + (F.col("ps_partkey") * _QTY_A + F.col("ps_suppkey") * _QTY_B)
            % _QTY_MOD
        ).cast("bigint").alias("ps_availqty"),
        supplycost_expr(F.col("ps_partkey"), F.col("ps_suppkey")).alias(
            "ps_supplycost"
        ),
    )


def supplycost_expr(partkey, suppkey):
    """The supplycost FORMULA as a standalone column — usable directly on
    lineitem's (l_partkey, l_suppkey) without materializing partsupp
    (how the Q9-shape profit query binds cost to each line)."""
    return (
        (partkey * _COST_A + suppkey * _COST_B) % _COST_MOD + _COST_BASE
    ) / F.lit(100.0)


def supplycost_sql(partkey: str, suppkey: str) -> str:
    return (
        f"((({partkey} * {_COST_A} + {suppkey} * {_COST_B}) % {_COST_MOD}"
        f" + {_COST_BASE}) / 100.0)"
    )


def partsupp_cte() -> str:
    """DuckDB twin of :func:`derived_partsupp`, as a CTE body named
    ``partsupp`` (prepend ``WITH``). Generated from the same constants."""
    return f"""partsupp AS MATERIALIZED (
      SELECT ps_partkey, ps_suppkey,
             1 + (ps_partkey * {_QTY_A} + ps_suppkey * {_QTY_B}) % {_QTY_MOD}
               AS ps_availqty,
             {supplycost_sql('ps_partkey', 'ps_suppkey')} AS ps_supplycost
      FROM (
        SELECT p_partkey AS ps_partkey,
               (p_partkey * {_SUPP_A} + t.i * {_SUPP_B})
                 % (SELECT count(*) FROM supplier) AS ps_suppkey
        FROM part CROSS JOIN (SELECT unnest(range({PS_PER_PART})) AS i) t
      )
    )"""
