"""Deterministically derived line-shipping attributes — completes TPC-H Q12.

The fixture lineitem has no ``l_shipmode`` / ``l_commitdate`` /
``l_receiptdate`` (SURVEY.md §8 recorded Q12 as inexpressible for that
reason).  As with :mod:`plans.partsupp`, the query SHAPE (join + two
conditional counts under a three-way date predicate) doesn't need TPC-H's
random columns — only values both engines derive identically.  Twinned
Spark/SQL builders from the SAME constants (the ``plans.numerics``
discipline):

    mode idx      = (l_orderkey*3  + l_linenumber*5)  mod 7   -> MODES[idx]
    l_commitdate  = date(l_shipdate) + ((l_orderkey*11 + l_linenumber*7)
                                        mod 61 - 30) days   # [-30, +30]
    l_receiptdate = date(l_shipdate) + ((l_orderkey*13 + l_linenumber*17)
                                        mod 30 + 1) days    # [1, 30]

All mod inputs are non-negative, so ``%`` agrees across engines; the
commit offset straddles zero so ``l_shipdate < l_commitdate`` selects
~half the lines, and receipt is strictly after ship, so the Q12 predicate
``l_shipdate < l_commitdate < l_receiptdate`` is non-trivial on every SF.
Dates are derived on the DATE-cast shipdate in BOTH engines so the
comparison/typing story is identical (no timestamp-vs-date drift).

Scale: pure row-local integer expressions inside whole-stage codegen —
no join, no shuffle; at 100 TB a real shipmode column would simply be
read instead and every consumer keeps the same plan shape.

Reference parity: the reference's TPC-H homework (hw4) runs Q12 on real
shipmode columns; this module re-opens the last of the five queries the
fixture schema had closed (SURVEY.md §8 gap note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODES = ("AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK")

_MODE_A, _MODE_B = 3, 5
_COMMIT_A, _COMMIT_B, _COMMIT_MOD, _COMMIT_SHIFT = 11, 7, 61, 30
_RCPT_A, _RCPT_B, _RCPT_MOD = 13, 17, 30


def with_shipping(lineitem: DataFrame) -> DataFrame:
    """lineitem + (l_shipmode, l_commitdate, l_receiptdate) derived
    columns (row-local expressions, codegen-friendly)."""
    idx = (
        F.col("l_orderkey") * _MODE_A + F.col("l_linenumber") * _MODE_B
    ) % len(MODES)
    ship = F.to_date("l_shipdate")
    c_off = (
        (F.col("l_orderkey") * _COMMIT_A + F.col("l_linenumber") * _COMMIT_B)
        % _COMMIT_MOD
        - _COMMIT_SHIFT
    ).cast("int")
    r_off = (
        (F.col("l_orderkey") * _RCPT_A + F.col("l_linenumber") * _RCPT_B)
        % _RCPT_MOD
        + 1
    ).cast("int")
    return lineitem.withColumns(
        {
            "l_shipmode": F.element_at(
                F.array(*[F.lit(m) for m in MODES]), (idx + 1).cast("int")
            ),
            "l_commitdate": F.date_add(ship, c_off),
            "l_receiptdate": F.date_add(ship, r_off),
        }
    )


def shipping_cte() -> str:
    """DuckDB twin of :func:`with_shipping`, as a CTE body named
    ``lineitem_ext`` (prepend ``WITH``).  Generated from the same
    constants; the mode CASE enumerates MODES so the two builders cannot
    drift."""
    case = " ".join(
        f"WHEN {i} THEN '{m}'" for i, m in enumerate(MODES)
    )
    return f"""lineitem_ext AS (
      SELECT *,
             CASE (l_orderkey * {_MODE_A} + l_linenumber * {_MODE_B})
                  % {len(MODES)} {case} END AS l_shipmode,
             CAST(l_shipdate AS DATE) + to_days(CAST(
               (l_orderkey * {_COMMIT_A} + l_linenumber * {_COMMIT_B})
               % {_COMMIT_MOD} - {_COMMIT_SHIFT} AS INTEGER)) AS l_commitdate,
             CAST(l_shipdate AS DATE) + to_days(CAST(
               (l_orderkey * {_RCPT_A} + l_linenumber * {_RCPT_B})
               % {_RCPT_MOD} + 1 AS INTEGER)) AS l_receiptdate
      FROM lineitem
    )"""
