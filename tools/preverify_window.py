"""Pre-verify the driver's round-5 correctness window at driver scale.

The driver oracle-checks the FIRST 50 registry entries at sf0.01 with an
EXACT value-hash.  This tool runs the same comparison locally through the
hardened harness (tests/oracle.py — fails on int-vs-float dtype splits,
the DuckDB HUGEINT trap), so a green run here predicts a green
CORRECTNESS_r{N}.json.  Usage:

    python tools/preverify_window.py [--sf /root/testdata/sf0.01] [--n 50]

Prints one status line per query and a final summary; exit code 1 if any
window query fails.
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--names", nargs="*", help="explicit query names instead of the window")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from bigdatamining_graduate_spark.plans.queries import ORACLE, QUERIES
    from tests.oracle import assert_matches

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .appName("preverify-window")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = args.names or list(QUERIES)[: args.n]
    failures: list[str] = []
    no_oracle: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            df = QUERIES[name](spark, args.sf)
            if name in ORACLE:
                assert_matches(df, ORACLE[name], args.sf)
                status = "GREEN"
            else:
                n_rows = df.count()
                status = f"rows_only({n_rows})"
                no_oracle.append(name)
        except Exception:
            status = "FAIL"
            failures.append(name)
            traceback.print_exc(limit=4)
        print(f"{status:>14}  {time.time() - t0:6.1f}s  {name}", flush=True)

    print(
        f"\nsummary: {len(names) - len(failures) - len(no_oracle)} green, "
        f"{len(no_oracle)} rows-only ({', '.join(no_oracle) or '-'}), "
        f"{len(failures)} FAIL ({', '.join(failures) or '-'})"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
