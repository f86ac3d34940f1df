"""Sinks (SURVEY.md §2.1 S11-S14).

Replaces the reference's driver-side ``toPandas().to_csv`` exports
(S13, ``hw2/BDM_hw2_final.py:183-184``) with distributed writers; the
``coalesce(1)`` single-file option (S12, ``hw0/hw0_3.py:49``) is kept as
an explicit, documented choice (it serializes the final stage — fine for
small outputs, never for fact tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
