"""Ingestion readers for the reference's source formats (SURVEY.md §2.1).

Every reader is fully distributed with an EXPLICIT schema — the two
reference anti-patterns they replace:

* ``collect()`` → ``createDataFrame`` ingestion (S8, ``hw4/hw4.py:33-41``):
  the whole dataset round-trips through the driver. Here ``spark.read.text``
  + ``split`` does the same parse executor-side.
* ``inferSchema=True`` (S5, ``FinalProject/BDM_Final.py:78``): an extra
  sampling pass and engine-dependent types. All readers take StructTypes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_delimited(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
    sep: str = ",",
    header: bool = False,
    escape: str = '"',
) -> DataFrame:
    """CSV/semicolon/tab files with explicit schema (S1 ``hw0/hw0_1.py:10``
    ;-separated, S4 escape-quoted ``hw2/BDM_hw2_final.py:31``). Accepts a
    glob or a LIST of paths — the reference's per-file union loop (S6/S7,
    ``FinalProject/BDM_Final.py:75-81``) collapses into one multi-path scan.
    """
    reader = (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", sep)
        .option("escape", escape)
        .option("mode", "PERMISSIVE")
    )
    return reader.csv(paths if isinstance(paths, list) else [paths])


def read_multichar_delimited(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = "::",
) -> DataFrame:
    """Multi-character-delimiter files (S2: MovieLens ``::`` .dat,
    ``hw4/hw4.py:25-35``). Spark's CSV source only takes 1-char separators,
    and the reference's workaround collects to the driver (S8); here:
    ``read.text`` → ``split`` → positional casts, all executor-side."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), sep, -1)
    # F.get (not getItem): rows with missing fields yield NULLs instead of
    # an ANSI INVALID_ARRAY_INDEX error; try_cast (not cast): malformed
    # cells null out instead of ANSI NumberFormatException — together the
    # permissive-CSV semantics (P15) the docstring promises
    cols = [
        F.get(parts, i).try_cast(f.dataType).alias(f.name)
        for i, f in enumerate(schema.fields)
    ]
    return raw.select(*cols)


def read_whole_files(spark: SparkSession, glob_path: str) -> DataFrame:
    """(file, content) rows — one row per file (S3: ``wholeTextFiles`` over
    Reuters ``*.sgm``, ``hw3/hw3.py:20``). File-granular parallelism: each
    file is one task's row, no driver involvement."""
    df = spark.read.option("wholetext", True).text(glob_path)
    return df.select(
        F.input_file_name().alias("file"), F.col("value").alias("content")
    )


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """pandas → DataFrame via Arrow (S9, ``hw2/BDM_hw2_final.py:209``);
    the session factory enables ``spark.sql.execution.arrow.pyspark``."""
    return spark.createDataFrame(pdf)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines reader with an EXPLICIT schema — the interchange format
    training-data pipelines actually exchange (one JSON doc per line).
    Never schema-inference: on a 100 TB corpus inference is a full extra
    pass, and mixed/sparse keys make its result run-dependent. Malformed
    lines land in the ``_corrupt_record`` pattern only if the schema asks
    for it; here they null out (PERMISSIVE), matching the reference's
    tolerant ingestion (SURVEY.md §2.2 P15)."""
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — Spark-native columnar source with the same pushdown
    properties as parquet (filters and projections reach the reader)."""
    return spark.read.orc(path)
