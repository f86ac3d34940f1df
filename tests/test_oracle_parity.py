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


def test_driver_window_prioritizes_unverified_queries():
    """The driver's correctness gate samples the FIRST 50 registry
    entries; rounds 1-2 verified q01-q50, so the rotation must keep
    every not-yet-driver-verified query ahead of all verified ones —
    otherwise a round burns its oracle window re-checking known-good
    queries."""
    from bigdatamining_graduate_spark.plans.queries import (
        _DRIVER_VERIFIED,
        ORACLE,
        QUERIES,
    )

    names = list(QUERIES)
    verified_flags = [n.split("_", 1)[0] in _DRIVER_VERIFIED for n in names]
    first_verified = verified_flags.index(True)
    assert all(verified_flags[first_verified:]), (
        "verified queries must form a contiguous tail"
    )
    assert not any(verified_flags[:first_verified])
    # every name still has its callable, and oracles only for registered names
    assert set(ORACLE) <= set(QUERIES)
