#!/usr/bin/env python
"""Interleaved same-session A/B for a module rewrite (rounds 11-12).

Single-session benchmark numbers on this box swing up to 2x (cold
codegen, page cache, checkpoint first-materialization), so a plain
before/after pair of runs cannot decide a 10-25% question.  This tool
alternates VARIANTS of one module inside ONE JVM/session (file swap +
importlib.reload), N reps each, and reports per-query medians — drift
affects both variants equally, so the sign of the difference is
trustworthy.  Round 11 used it to adjudicate the _attributed_delta_counts
rewrite (kept: two-join adjacency attach; rejected: exploded-probe +
regroup, 10-24% slower); round 12 uses it for the stream-handler
checkpoint question (VERDICT r11 #1) and the graph/IVM rewrites.

Usage:
    python tools/ab_interleaved.py <module> <old_path> <new_path> \
        <qname> [<qname> ...] [--reps N]

<module> is the dotted module under bigdatamining_graduate_spark, e.g.
``operators.graph`` or ``streaming.jobs``.  The tool leaves the NEW
variant in place on exit.  Modules that re-export the swapped symbols
(plans.queries imports operators at module level) are reloaded too.
"""
import argparse
import importlib
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from bigdatamining_graduate_spark.session import get_spark  # noqa: E402
from bigdatamining_graduate_spark.checkpoints import release_checkpoints  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("module")
    ap.add_argument("old_path")
    ap.add_argument("new_path")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(
        app_name="ab-interleaved",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    modname = f"bigdatamining_graduate_spark.{args.module}"
    mod = importlib.import_module(modname)
    target_path = mod.__file__
    variants = {"old": args.old_path, "new": args.new_path}

    import bigdatamining_graduate_spark.plans.queries as QM

    res = {v: {n: [] for n in args.names} for v in variants}
    # warmup once (smallest fixture, not measured)
    QM.QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    release_checkpoints()
    for rep in range(args.reps):
        for v, src in variants.items():
            shutil.copy(src, target_path)
            importlib.reload(mod)
            # plans.queries holds module-level references to the
            # operator modules; rebind them so the swap takes effect
            importlib.reload(QM)
            for n in args.names:
                spark.sparkContext.setJobDescription(f"ab[{v}] rep{rep}: {n}")
                t0 = time.perf_counter()
                QM.QUERIES[n](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                release_checkpoints()
                res[v][n].append(round(dt, 2))
    shutil.copy(args.new_path, target_path)
    out = {
        v: {n: sorted(ts)[len(ts) // 2] for n, ts in d.items()}
        for v, d in res.items()
    }
    print(json.dumps({"medians": out, "raw": res}))


if __name__ == "__main__":
    main()
