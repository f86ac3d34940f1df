#!/usr/bin/env python
"""Interleaved same-session A/B for a module rewrite (round 11).

Single-session benchmark numbers on this box swing up to 2x (cold
codegen, page cache, checkpoint first-materialization), so a plain
before/after pair of runs cannot decide a 10-25% question.  This tool
alternates VARIANTS of one module inside ONE JVM/session (file swap +
importlib.reload), 4 reps each, and reports per-query medians — drift
affects both variants equally, so the sign of the difference is
trustworthy.  Used to adjudicate the round-11 _attributed_delta_counts
rewrite (kept: two-join adjacency attach; rejected: exploded-probe +
regroup, 10-24% slower on q246/q247/q248 at sf0.1).

Usage: put the two module variants at the VARIANTS paths, then
    python tools/ab_interleaved.py
"""
import importlib, json, shutil, sys, time
sys.path.insert(0, "/root/repo")
from bigdatamining_graduate_spark.session import get_spark
from bigdatamining_graduate_spark.checkpoints import release_checkpoints

spark = get_spark(app_name="ab-graph", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
import bigdatamining_graduate_spark.operators.graph as GR
from bigdatamining_graduate_spark.plans.queries import QUERIES

GPATH = "/root/repo/bigdatamining_graduate_spark/operators/graph.py"
VARIANTS = {"old": "/tmp/graph_old.py", "new": "/tmp/graph_new.py"}
NAMES = ["q246_incremental_triangles", "q247_delete_aware_triangles",
         "q270_upsert_aware_triangles", "q248_stream_incremental_triangles"]
SF = "/root/testdata/sf0.1"

res = {v: {n: [] for n in NAMES} for v in VARIANTS}
# warmup once
QUERIES["q110_part_triangles"](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
release_checkpoints()
for rep in range(4):
    for v, src in VARIANTS.items():
        shutil.copy(src, GPATH)
        importlib.reload(GR)
        for n in NAMES:
            t0 = time.perf_counter()
            QUERIES[n](spark, SF).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            release_checkpoints()
            res[v][n].append(round(dt, 2))
shutil.copy("/tmp/graph_new.py", GPATH)
out = {v: {n: sorted(ts)[len(ts)//2] for n, ts in d.items()} for v, d in res.items()}
print(json.dumps({"medians": out, "raw": res}))
