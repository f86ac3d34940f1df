#!/usr/bin/env python
"""Capture ``explain("formatted")`` for named queries into
plans/$PLANS_ROUND/ (default r12).

Usage:
    python tools/capture_plans.py <suffix> <qname> [<qname> ...]

Writes ``plans/<round>/<qname>_<suffix>.txt`` for each query (suffix is
"before" / "after").  Composite lifecycle queries (store builds, stream
drains, checkpointed loops) EXECUTE their setup work when the query
callable runs; the captured plan is the final consuming stage — the part
the optimizer sees — which is also what the round-11 optimization notes
reference.  sf dir comes from $SPARK_GRAFT_SF_DIR (default sf0.01 so the
capture is cheap; plan SHAPE is SF-independent).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bigdatamining_graduate_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = REPO / "plans" / os.environ.get("PLANS_ROUND", "r12")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    from bigdatamining_graduate_spark.plans.queries import QUERIES
    from bigdatamining_graduate_spark.checkpoints import release_checkpoints

    for name in names:
        spark.sparkContext.setJobDescription(f"capture: {name}")
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        release_checkpoints()
        print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
