#!/usr/bin/env python
"""Standing two-ordering noise protocol (BASELINE.md, round-5 origin).

Runs the full headline set twice — ordering A (bench.py order) and
ordering B (second half first) — each in a FRESH SparkSession/JVM, and
reports the watchlist queries' warm medians against their committed
builder values.  A query is a regression only if BOTH orderings
reproduce >1.5x committed; otherwise it is driver-session warm-up noise
(the r9 driver run showed exactly the front-of-run pattern: q36 2.48x,
q01 1.98x, q29 1.70x, all code-unchanged since r8).

Usage: python tools/two_ordering.py            (driver: runs A then B)
       python tools/two_ordering.py A out.json (one ordering -> out.json)
  Each ordering runs as its own process so JIT/codegen warm-up state
  cannot leak between orderings.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# builder-committed r10 warm medians (BASELINE.md round-10 table) for the
# queries the r10 VERDICT flagged (>1.5x single-session driver ratios, plus
# q250's committed-vs-driver contradiction).
WATCHLIST = {
    "q252_incremental_phash_pairs": 0.84,
    "q249_ivf_retrain_refresh": 4.45,
    "q47_stream_session_windows": 1.43,
    "q250_triangle_store_vacuum": 22.52,
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
    if len(sys.argv) == 3 and sys.argv[1] in ("A", "B"):
        warm = run_ordering(sys.argv[1])
        with open(sys.argv[2], "w") as f:
            json.dump(warm, f)
        print(json.dumps({k: warm.get(k) for k in WATCHLIST}))
        return

    # driver mode: run both orderings as subprocesses (each its own JVM,
    # run-scoped output dir — concurrent protocol runs cannot collide),
    # then adjudicate
    outdir = tempfile.mkdtemp(prefix="bdm_two_ordering_")
    outs = {w: os.path.join(outdir, f"ordering_{w}.json") for w in ("A", "B")}
    for which in ("A", "B"):
        print(f"=== ordering {which} ===", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), which, outs[which]],
            check=True,
            cwd=ROOT,
        )
    a = json.load(open(outs["A"]))
    b = json.load(open(outs["B"]))
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
