"""Every registered query with an oracle must hash-match DuckDB — the
local mirror of the driver's t2 correctness gate (run at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from bigdatamining_graduate_spark.plans.queries import ORACLE, QUERIES

from .conftest import SF_SMOKE
from .oracle import assert_matches


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert_matches(df, ORACLE[name], SF_SMOKE)


def test_all_queries_run(spark):
    for name, fn in QUERIES.items():
        assert fn(spark, SF_SMOKE).count() >= 0, name


def test_entry_smoke(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
