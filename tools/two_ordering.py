#!/usr/bin/env python
"""Standing two-ordering noise protocol (BASELINE.md, round-5 origin).

Runs the full headline set twice — ordering A (bench.py order) and
ordering B (second half first) — each in a FRESH SparkSession/JVM, and
reports the watchlist queries' warm medians against their committed
builder values.  A query is a regression only if BOTH orderings
reproduce >1.5x committed; otherwise it is driver-session warm-up noise
(the r9 driver run showed exactly the front-of-run pattern: q36 2.48x,
q01 1.98x, q29 1.70x, all code-unchanged since r8).

Usage: python tools/two_ordering.py [A|B]
  With no arg, prints instructions (each ordering must be its own
  process so JIT/codegen warm-up state cannot leak between orderings).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# builder-committed r9 warm medians (BASELINE.md round-9 table)
WATCHLIST = {
    "q36_stream_hourly_counts": 1.55,
    "q01_pricing_summary": 1.35,
    "q29_knn_bruteforce": 0.97,
}


def run_ordering(which: str) -> dict:
    import bench  # noqa: E402  (repo-root import, sets up QUERIES lazily)
    from bigdatamining_graduate_spark.session import get_spark
    from bigdatamining_graduate_spark.checkpoints import release_checkpoints
    from __spark_entry__ import queries

    names = list(bench.HEADLINE)
    if which == "B":
        half = len(names) // 2
        names = names[half:] + names[:half]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    qmap = queries()
    warm: dict[str, float] = {}
    for name in names:
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_checkpoints()
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            release_checkpoints()
        warm[name] = round(sorted(samples)[1], 3)
    return warm


def main() -> None:
    if len(sys.argv) == 2 and sys.argv[1] in ("A", "B"):
        warm = run_ordering(sys.argv[1])
        out = os.path.join(ROOT, f"/tmp/ordering_{sys.argv[1]}.json")
        with open(out, "w") as f:
            json.dump(warm, f)
        print(json.dumps({k: warm.get(k) for k in WATCHLIST}))
        return

    # driver mode: run both orderings as subprocesses, then adjudicate
    for which in ("A", "B"):
        print(f"=== ordering {which} ===", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), which],
            check=True,
            cwd=ROOT,
        )
    a = json.load(open("/tmp/ordering_A.json"))
    b = json.load(open("/tmp/ordering_B.json"))
    verdicts = {}
    for q, committed in WATCHLIST.items():
        ra, rb = a[q] / committed, b[q] / committed
        verdicts[q] = {
            "committed": committed,
            "ordering_A": a[q],
            "ordering_B": b[q],
            "ratio_A": round(ra, 2),
            "ratio_B": round(rb, 2),
            "regression": bool(ra > 1.5 and rb > 1.5),
        }
    print(json.dumps(verdicts, indent=1))


if __name__ == "__main__":
    main()
