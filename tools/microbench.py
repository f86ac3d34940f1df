#!/usr/bin/env python
"""Time a named subset of queries with bench.py's exact methodology
(noop sink, one cold + median-of-3 warm) — the per-change measurement
loop of the optimization rounds.

Usage:
    python tools/microbench.py <qname> [<qname> ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bigdatamining_graduate_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="bdm-microbench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bigdatamining_graduate_spark.plans.queries import QUERIES
    from bigdatamining_graduate_spark.checkpoints import release_checkpoints

    # same warmup as bench.py
    QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"microbench: {name}")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        release_checkpoints()
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
            release_checkpoints()
        timings[name] = round(sorted(samples)[1], 3)
    print(
        json.dumps(
            {
                "queries": timings,
                "cold": cold,
                "total": round(sum(timings.values()), 3),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
