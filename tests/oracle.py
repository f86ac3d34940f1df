"""Local mirror of the driver's DuckDB-oracle comparison.

Collects the Spark result and the DuckDB oracle result, aligns columns by
sorted name, sorts rows, and compares — exact for ints/strings AND floats
(strict by default since round 9; ``TOLERANT_FLOATS`` queries opt out
explicitly at the call site).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from bigdatamining_graduate_spark.sources.catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.isdir(p):  # Spark-written layout (dir of part files)
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64[ns,"):
            df[c] = df[c].dt.tz_localize(None)
        elif df[c].dtype.kind == "i":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_matches(spark_df, sql: str, sf_dir: str, float_tol: float = 0.0) -> None:
    """Compare a Spark result to its DuckDB oracle.

    STRICT BY DEFAULT (``float_tol=0.0``, driver-equivalent): floats
    must match bit-for-bit.  Every registered float column is derived
    from exact decimals/integers with identical expression trees on
    both engines, so ANY divergence is a real cross-engine
    disagreement (the class of bug the old blanket 1e-9 default masked
    in q212, VERDICT r7).  Call sites for queries in
    ``plans.queries.TOLERANT_FLOATS`` must OPT OUT by passing a
    tolerance explicitly (ADVICE r8: the scale-gate and workload call
    sites now inherit the strict contract instead of a silent 1e-9)."""
    got = _canon(spark_df.toPandas())
    exp = _canon(run_oracle(sql, sf_dir))
    assert list(got.columns) == list(exp.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(exp.columns)}"
    )
    assert len(got) == len(exp), f"row count mismatch: spark={len(got)} oracle={len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        # Driver-strictness: the driver's value-hash is exact, so an
        # int64-vs-float64 dtype split (e.g. DuckDB SUM(BIGINT) ->
        # HUGEINT -> float64 via .df()) MUST fail here too, before any
        # tolerance path masks it.  Cast integer SUMs in oracle SQL to
        # BIGINT — see the HUGEINT trap note in SCALE.md.
        assert g.dtype.kind == e.dtype.kind, (
            f"dtype-kind mismatch in {c}: spark={g.dtype} oracle={e.dtype} "
            "(DuckDB HUGEINT->float64? cast the oracle aggregate to BIGINT)"
        )
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            for i, (a, b) in enumerate(zip(g, e)):
                if pd.isna(a) and pd.isna(b):
                    continue
                assert not (pd.isna(a) or pd.isna(b)), f"{c}[{i}]: {a!r} vs {b!r}"
                assert math.isclose(a, b, rel_tol=float_tol, abs_tol=float_tol), (
                    f"{c}[{i}]: spark={a!r} oracle={b!r}"
                )
        else:
            if not g.equals(e):
                diff = (g.astype(str) != e.astype(str))
                idx = diff[diff].index[:5].tolist()
                raise AssertionError(
                    f"value mismatch in {c} at rows {idx}: "
                    f"spark={g.iloc[idx].tolist() if idx else []} "
                    f"oracle={e.iloc[idx].tolist() if idx else []}"
                )
