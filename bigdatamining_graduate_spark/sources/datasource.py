"""Custom Python DataSource (Spark 4 extension point, SPARK-44076).

``read_multichar_delimited`` (readers.py) handles the reference's
``::``-delimited MovieLens files as text→split→cast. This module exposes
the SAME format as a first-class *pluggable source*:

    spark.dataSource.register(DelimTextDataSource)
    spark.read.format("delimtext").schema(sch)
         .option("delimiter", "::").load("/path/*.dat")

Why both exist: the expression pipeline is the hot-path form (pure JVM
after the scan); the DataSource form is the EXTENSION-POINT demo — the
shape any source Spark lacks natively (an internal wire format, a
service API, a proprietary container) plugs in through, with
partition-granular parallelism the scheduler understands. Reads run in
Python (Arrow-batched by the engine), so for formats Spark *can* express
with built-ins, prefer the expression form — this is documented
capability, not a recommendation to move scans into Python.

Partitioning: one ``InputPartition`` per matched file — each file is an
independent task, the same granularity ``wholeTextFiles`` gives the
reference (S3) and enough for the scheduler to spread a directory of
shards across executors. A real deployment would list via the cluster
filesystem and split large files by byte range.
"""

from __future__ import annotations

import glob as _glob

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _caster(dt: T.DataType):
    """Permissive per-field cast (P15): malformed cells become NULL, the
    same tolerance the CSV PERMISSIVE mode and readers.py give."""
    if isinstance(dt, (T.LongType, T.IntegerType)):
        base = int
    elif isinstance(dt, (T.DoubleType, T.FloatType)):
        base = float
    else:
        base = str

    def cast(v: str):
        if v is None or v == "":
            return None
        try:
            return base(v)
        except ValueError:
            return None

    return cast


class DelimTextReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._sep = options.get("delimiter", "::")
        self._path = options.get("path")
        if not self._path:
            raise ValueError("delimtext requires a load(path)")
        self._casts = [_caster(f.dataType) for f in schema.fields]

    def partitions(self):
        paths = sorted(_glob.glob(self._path)) or [self._path]
        return [_FilePartition(p) for p in paths]

    def read(self, partition: _FilePartition):
        n = len(self._casts)
        with open(partition.path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                parts = line.split(self._sep)
                yield tuple(
                    self._casts[i](parts[i]) if i < len(parts) else None
                    for i in range(n)
                )


class DelimTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "delimtext"

    def schema(self):
        raise ValueError(
            "delimtext has no default schema — pass one with .schema(...) "
            "(explicit-schema policy: no inference pass, SCALE.md §1)"
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return DelimTextReader(schema, self.options)


def register_delimtext(spark) -> None:
    """Register the ``delimtext`` format on a session, shipping this
    module BY VALUE. Python data sources reach the executor-side Python
    workers via cloudpickle, which serializes classes by REFERENCE when
    their module is importable — fine on a cluster that deploys the
    package (``--py-files``/conda env), but a driver process that merely
    ``sys.path``-inserted the repo (the verify harness, any external
    caller) would hand workers an unimportable reference
    (``ModuleNotFoundError``). By-value registration makes the source
    self-contained: the class rides inside the pickle. Idempotent."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(DelimTextDataSource)
