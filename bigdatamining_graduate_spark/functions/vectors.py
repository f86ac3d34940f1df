"""Array-vector math as built-in expressions (JVM-side, codegen-able).

Replaces the reference's driver-side / UDF vector ops: the cosine
similarity UDF ``float(x.dot(y))`` over MinMax-scaled ml vectors
(``hw4/hw4.py:102,136``) becomes ``zip_with`` + ``aggregate`` over plain
``array<float/double>`` columns — no VectorUDT, no Python in the hot path.

DuckDB twins use ``list_dot_product`` / ``list_cosine_similarity``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine`.

    Written out as dot/(norm*norm) rather than ``list_cosine_similarity``
    so the floating-point operation ORDER matches Spark's left-to-right
    aggregate exactly — keeps value-hash comparisons stable.
    """
    d = f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
    na = f"sqrt(list_sum(list_transform({a}, x -> x * x)))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> x * x)))"
    return f"({d} / ({na} * {nb}))"
