"""Engine-independent exact aggregation helpers.

Floating-point sums are order-dependent, and Spark and DuckDB will not sum
60k doubles in the same order — so every declared query aggregates money /
quantity columns through exact decimals and only casts back to double at
the end (SURVEY.md §7.4 risk 7). Fixture numerics carry ≤2 decimal digits,
so ``decimal(20,2)`` casts are lossless and bit-identical in both engines.

Each Spark helper has a ``*_sql`` DuckDB twin generated from the same
constants.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(20,2)"


def dec(c: Column) -> Column:
    """Lossless decimal view of a 2-decimal-digit double column."""
    return c.cast(DEC)


def dbl_sql(e: str) -> str:
    """CORRECTLY-ROUNDED decimal→double for DuckDB oracle text.

    DuckDB's direct ``cast(decimal as double)`` converts the int128
    unscaled value to double and divides by 10^scale — two roundings,
    which drifts 1 ULP from the correctly-rounded value once the
    unscaled magnitude exceeds 2^53 (caught by the 100× gate: q01's
    sum_charge over 60M rows, exact decimal ...874000, direct cast
    ...87396 while Spark's BigDecimal.doubleValue is ...874).  The
    varchar hop — exact decimal text → strtod — is correctly rounded
    at every magnitude, and identical to the direct cast below 2^53,
    so sf0.01 driver hashes are unchanged."""
    return f"cast(cast({e} as varchar) as double)"


def exact_sum(c: Column) -> Column:
    """Order-independent sum of a 2-decimal double, returned as double."""
    return F.sum(dec(c)).cast("double")


def exact_sum_sql(e: str) -> str:
    return dbl_sql(f"sum(cast({e} as {DEC}))")


def exact_avg(c: Column) -> Column:
    """avg = exact decimal sum / non-null count, as double (deterministic)."""
    return F.sum(dec(c)).cast("double") / F.count(c)


def exact_avg_sql(e: str) -> str:
    return f"({dbl_sql(f'sum(cast({e} as {DEC}))')} / count({e}))"


def revenue(price: Column, discount: Column) -> Column:
    """Exact per-row ``price * (1 - discount)`` as decimal scale-4.

    (20,2) x (12,2) -> scale-4 decimal, exact in Spark and DuckDB; summing
    it stays exact, unlike summing the double product.
    """
    return dec(price) * (F.lit(1.0) - discount).cast("decimal(12,2)")


def revenue_sql(price: str, discount: str) -> str:
    return f"(cast({price} as {DEC}) * cast(1.0 - {discount} as decimal(12,2)))"


def charge(price: Column, discount: Column, tax: Column) -> Column:
    """Exact ``price * (1-disc) * (1+tax)``: the scale-4 revenue is
    re-bounded to decimal(24,4) so the second multiply stays inside both
    engines' 38-digit decimal width with no rounding."""
    rev = revenue(price, discount).cast("decimal(24,4)")
    return rev * (F.lit(1.0) + tax).cast("decimal(12,2)")


def charge_sql(price: str, discount: str, tax: str) -> str:
    rev = f"cast({revenue_sql(price, discount)} as decimal(24,4))"
    return f"({rev} * cast(1.0 + {tax} as decimal(12,2)))"
