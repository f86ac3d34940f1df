"""Sinks (SURVEY.md §2.1 S11-S14).

Replaces the reference's driver-side ``toPandas().to_csv`` exports
(S13, ``hw2/BDM_hw2_final.py:183-184``) with distributed writers; the
``coalesce(1)`` single-file option (S12, ``hw0/hw0_3.py:49``) is kept as
an explicit, documented choice (it serializes the final stage — fine for
small outputs, never for fact tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.layout import z_interleave_sql


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    quote_all: bool = False,
    single_file: bool = False,
    mode: str = "overwrite",
    escape: str = '"',
) -> None:
    """CSV sink (S11 ``hw3/hw3.py:106``: header/overwrite/quoteAll).

    ``escape`` defaults to '"' (RFC-4180 doubled quotes) — Spark's writer
    default is backslash, which most readers (incl. the reference's
    ``option("escape", '"')`` reads, S4) would mis-parse."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.option("header", header)
        .option("quoteAll", quote_all)
        .option("escape", escape)
        .mode(mode)
        .csv(path)
    )


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink with optional hive-style partitioning — the layout
    that makes partition pruning work downstream at 100 TB."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def zorder_write(
    df: DataFrame,
    path: str,
    dims: list[str],
    bits: int = 8,
    num_files: int | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet sink — the PRODUCTION layout path whose
    audit twin is ``plans.queries.q87_zorder_layout``. ``dims`` are
    non-negative integer columns, each bounded to ``[0, 2**bits)`` (bucket
    wider domains first, e.g. ``user_id % 2**bits``); rows are clustered
    along the Morton curve of those dims so every written file gets a
    tight per-dimension bounding box and parquet min/max stats prune on
    ALL the dims at once.

    Scale shape: ONE range shuffle (``repartitionByRange`` on the
    z-value, sampled range boundaries keep files even under skew) + a
    per-partition sort — never a global ``Window.orderBy`` (q87's audit
    uses one only for oracle determinism; this is the path you run on a
    cluster). ``max_records_per_file`` bounds file size within a
    partition via the writer option; the z column itself is dropped
    before writing (projection preserves the per-partition order)."""
    z = F.expr(z_interleave_sql(dims, bits)).alias("__z")
    clustered = df.select("*", z)
    if num_files is not None:
        clustered = clustered.repartitionByRange(num_files, "__z")
    else:
        clustered = clustered.repartitionByRange("__z")
    clustered = clustered.sortWithinPartitions("__z").drop("__z")
    w = clustered.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_text(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite") -> None:
    """Text sink (S12, ``hw0/hw0_3.py:49`` ``saveAsTextFile``)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).text(path)


def write_jsonl(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite") -> None:
    """JSON-lines sink (one JSON object per row per line) — the export
    twin of ``readers.read_jsonl``."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (Spark-native columnar alternative to parquet — same
    predicate-pushdown/column-pruning story; some lakehouse stacks are
    ORC-standardized). Round-trip twin of ``readers.read_orc``."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
