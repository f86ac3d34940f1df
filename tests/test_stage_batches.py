"""Focused pins for the round-11 one-pass micro-batch staging helper
(`streaming.jobs._stage_batches`): the old per-slice loop's observable
contract must survive the single partitioned write — one file per batch
id, mtime-pinned arrival order, slice contents exactly the filtered
rows, staged schema without the synthetic id column, and an EMPTY slice
still producing its trigger file (partitionBy skips empty values; the
old loop wrote an empty parquet, and a missing file would silently drop
a trigger)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdatamining_graduate_spark.streaming.jobs import _stage_batches


def _mk(tmp_path, name):
    stage = os.path.join(str(tmp_path), name)
    indir = os.path.join(stage, "in")
    os.makedirs(indir)
    return stage, indir


def test_stage_batches_matches_per_slice_loop(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    stage, indir = _mk(tmp_path, "basic")
    bid = (F.col("id") % 3).cast("int")
    _stage_batches(df, bid, 3, indir, stage)

    files = sorted(os.listdir(indir))
    assert files == ["batch0.parquet", "batch1.parquet", "batch2.parquet"]
    # arrival order pinned by mtime, oldest first
    mtimes = [os.path.getmtime(os.path.join(indir, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3
    for i in range(3):
        got = spark.read.parquet(os.path.join(indir, f"batch{i}.parquet"))
        # schema identical to the source (no __b column leaks through)
        assert got.columns == df.columns
        expect = df.filter(bid == i)
        assert got.count() == expect.count()
        assert got.exceptAll(expect).count() == 0
        assert expect.exceptAll(got).count() == 0
    # the tmp slice dir is cleaned up
    assert not os.path.exists(os.path.join(stage, "slices"))


def test_stage_batches_empty_slice_still_stages_a_trigger_file(
    spark, tmp_path
):
    df = spark.range(100).select(F.col("id"))
    stage, indir = _mk(tmp_path, "empty")
    # batch id 1 is unreachable -> empty slice; 0 and 2 split the rows
    bid = F.when(F.col("id") < 50, 0).otherwise(2).cast("int")
    _stage_batches(df, bid, 3, indir, stage)
    assert sorted(os.listdir(indir)) == [
        "batch0.parquet",
        "batch1.parquet",
        "batch2.parquet",
    ]
    empty = spark.read.parquet(os.path.join(indir, "batch1.parquet"))
    assert empty.count() == 0
    assert empty.columns == df.columns


def test_stage_batches_null_bid_rows_stage_nowhere(spark, tmp_path):
    """A row whose id expression is null matched no predicate under the
    old loop and was staged nowhere; the helper must preserve that."""
    df = spark.range(90).select(F.col("id"))
    stage, indir = _mk(tmp_path, "nullbid")
    bid = (
        F.when(F.col("id") < 30, 0)
        .when(F.col("id") < 60, 1)
        # ids >= 60: no branch -> null bid -> dropped
    )
    _stage_batches(df, bid, 2, indir, stage)
    total = sum(
        spark.read.parquet(os.path.join(indir, f"batch{i}.parquet")).count()
        for i in range(2)
    )
    assert total == 60
