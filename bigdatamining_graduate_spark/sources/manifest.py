"""File-level data-skipping manifest (Delta/Iceberg-style min-max stats).

``zorder_write`` (sinks.py) clusters rows so each parquet file covers a
tight bounding box; this module adds the other half of the lakehouse
data-skipping loop: a per-file stats MANIFEST and a reader that prunes
the file list against it before Spark ever opens a footer.

At 100 TB the manifest is what turns a selective query from "open one
million footers" into "open forty": the stats table has one row per file
(built once per snapshot, or incrementally per appended file), so
pruning it is metadata-scale work. Collecting the SURVIVING FILE LIST on
the driver is the one deliberate driver-side collect in this engine —
file listings are O(files-after-pruning), never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def collect_manifest(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file (n_rows, min, max per col) stats over a parquet layout.

    One distributed scan grouped by ``input_file_name()`` — the group key
    is the file, so the agg is map-side-combinable and the result is
    |files| rows. (Parquet footers already hold these stats; Spark's
    public API doesn't expose them, and one columnar scan of only
    ``cols`` per snapshot is the portable price. Persist the result next
    to the data and append per new file.)"""
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), *cols
    )
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.groupBy("file").agg(*aggs)


def append_manifest(
    spark: SparkSession, path: str, manifest: DataFrame, cols: list[str]
) -> DataFrame:
    """Incrementally extend a manifest: stat ONLY files not yet covered
    (file listing is driver-side metadata work; the scan is restricted to
    the new files), union with the existing rows. This is the append-only
    maintenance path — a 100 TB corpus never re-stats its tail."""
    import glob
    import os

    known = {r["file"] for r in manifest.select("file").collect()}
    all_files = [
        f"file://{p}" if not p.startswith("file:") else p
        for p in glob.glob(os.path.join(path, "*.parquet"))
    ]
    new = [p for p in all_files if p not in known]
    if not new:
        return manifest
    df = spark.read.parquet(*new).select(
        F.input_file_name().alias("file"), *cols
    )
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return manifest.unionByName(df.groupBy("file").agg(*aggs))


def prune_files(manifest: DataFrame, ranges: dict[str, tuple]) -> list[str]:
    """File paths whose [min, max] interval intersects every requested
    ``col: (lo, hi)`` range (closed intervals; None = unbounded side)."""
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            cond = cond & (F.col(f"{c}_max") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(f"{c}_min") <= F.lit(hi))
    return [r["file"] for r in manifest.filter(cond).select("file").collect()]


def pruned_read(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    ranges: dict[str, tuple],
) -> DataFrame:
    """Read only the files that can contain rows in ``ranges``, then
    re-apply the predicates exactly (stats prune candidates; the row
    filter stays, as in every data-skipping reader)."""
    files = prune_files(manifest, ranges)
    if not files:
        empty = spark.read.parquet(path).limit(0)
        df = empty
    else:
        df = spark.read.parquet(*files)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.filter(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(c) <= F.lit(hi))
    return df
