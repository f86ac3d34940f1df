"""The explicit checkpoint-release contract (VERDICT r6 What's-wrong #1).

``localCheckpoint`` blocks used to be freed only when Python GC dropped
the DataFrame wrapper (bench.py papered over it with a per-query
``gc.collect()``).  The ledger in ``checkpoints.py`` makes the lifetime
deterministic: every engine checkpoint is tracked, and
``release_checkpoints()`` unpersists all tracked blocks on demand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatamining_graduate_spark import checkpoints as CK


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_release_frees_blocks(spark):
    CK.release_checkpoints()  # start from a clean ledger
    base = _n_persistent(spark)
    df = CK.local_checkpoint(spark.range(10_000).select("id", (F.col("id") * 2).alias("v")))
    assert df.count() == 10_000
    assert CK.tracked_count() >= 1
    assert _n_persistent(spark) > base
    assert CK.release_checkpoints() >= 1
    assert CK.tracked_count() == 0
    assert _n_persistent(spark) == base


def test_lazy_checkpoint_tracked_and_released(spark):
    CK.release_checkpoints()
    df = CK.local_checkpoint(spark.range(1_000), eager=False)
    assert CK.tracked_count() == 1
    assert df.count() == 1_000  # materializes here
    CK.release_checkpoints()
    assert _n_persistent(spark) == 0


def test_release_previous_is_selective(spark):
    CK.release_checkpoints()
    a = CK.local_checkpoint(spark.range(100))
    b = CK.local_checkpoint(spark.range(200))
    a.count(), b.count()
    CK.release_previous(a)
    assert CK.tracked_count() == 1  # b still owned
    assert b.count() == 200  # b's blocks untouched
    CK.release_checkpoints()


def test_release_previous_tolerates_none_and_plain_frames(spark):
    CK.release_previous(None)
    CK.release_previous(spark.range(5))  # not a checkpoint: no-op


def test_iterative_operators_leave_no_blocks(spark):
    """End-to-end: the checkpoint-heavy operators (CC, PageRank, BFS)
    free every block after release — nothing left for GC."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES

    from .conftest import SF_SMOKE

    CK.release_checkpoints()
    for q in ("q71_neardup_components", "q107_part_pagerank", "q175_part_bfs_hops"):
        QUERIES[q](spark, SF_SMOKE).write.format("noop").mode(
            "overwrite"
        ).save()
        CK.release_checkpoints()
        assert _n_persistent(spark) == 0, q


def test_bench_has_no_gc_fallback():
    """bench.py must rely on the explicit contract, not gc.collect()."""
    import pathlib

    src = (pathlib.Path(__file__).resolve().parent.parent / "bench.py").read_text()
    assert "gc.collect" not in src
    assert "release_checkpoints" in src


def test_scoped_release_spares_callers_blocks(spark):
    """The token API (ADVICE r8): code running inside someone else's
    query — a foreachBatch handler, a library operator — snapshots the
    ledger with ``tracked_ids()`` and releases only its own delta with
    ``release_new_since``; the caller's blocks stay resident."""
    CK.release_checkpoints()
    callers = CK.local_checkpoint(spark.range(500))
    callers.count()
    before = CK.tracked_ids()
    inner = CK.local_checkpoint(spark.range(300))
    inner.count()
    assert CK.tracked_count() == 2
    assert CK.release_new_since(before) == 1
    assert CK.tracked_count() == 1  # caller's entry survives
    assert callers.count() == 500  # caller's blocks untouched
    # releasing an empty delta is a no-op
    assert CK.release_new_since(CK.tracked_ids()) == 0
    CK.release_checkpoints()
