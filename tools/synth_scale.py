#!/usr/bin/env python
"""Materialize a synthetic scaled-up fixture directory for scale checks.

Writes ``<out>/{table}.parquet`` mirroring an input sf dir with:

* ``documents`` ×N: copy k shifts ``doc_id`` by ``k * 10**8`` and suffixes
  every NON-STOPWORD token with ``"c<k>"``. The token remap is bijective
  per copy, so within-copy n-gram/minhash/simhash semantics (and thus the
  near-dup RATE) are preserved exactly, while cross-copy gram overlap is
  limited to the rare all-stopword n-grams — far below any join
  threshold, so the scaled corpus behaves like N independent shards of
  the original distribution, not a pile of exact duplicates. Stopwords
  stay verbatim so stopword-ratio quality filters (q28/q63/q99) see the
  original distribution too. ``n_chars`` is recomputed from the rewritten
  text so quality filters see consistent values.
* fact tables (``orders``/``lineitem``/``events``) ×N with join-preserving
  key shifts (the round-2 sf1 experiment, SCALE.md §6c): primary/foreign
  keys that must stay joined shift together; dimension foreign keys
  (custkey, partkey, suppkey, user_id) stay in range.
* dimension tables copied verbatim.

The output dir is DuckDB- and Spark-readable via the same per-table
``<table>.parquet`` layout the driver fixtures use, so the local oracle
harness (``tests/oracle.py``) runs unchanged against it. Usage:

    python tools/synth_scale.py [--sf-dir /root/testdata/sf0.1] \
        [--out /tmp/synth_sf1] [--copies 10] [--tables documents ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOC_SHIFT = 10**8
FACT_TABLES = ("orders", "lineitem", "events")
DIM_TABLES = ("region", "nation", "customer", "supplier", "part", "embeddings")


def scale_documents(spark, sf_dir: str, out: str, copies: int) -> None:
    from pyspark.sql import functions as F

    from bigdatamining_graduate_spark.functions.text import EN_STOPWORDS
    from bigdatamining_graduate_spark.sources.catalog import load_table

    base = load_table(spark, sf_dir, "documents")
    stops = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    parts = []
    for k in range(copies):
        suffix = F.lit(f"c{k}")
        remapped = F.concat_ws(
            " ",
            F.transform(
                F.split(F.coalesce(F.col("text"), F.lit("")), " "),
                lambda w: F.when(
                    F.array_contains(stops, w) | (w == F.lit("")), w
                ).otherwise(F.concat(w, suffix)),
            ),
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(k * DOC_SHIFT)).alias("doc_id"),
                remapped.alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text").cast("long"))
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.coalesce(8).write.mode("overwrite").parquet(f"{out}/documents.parquet")


def scale_facts(spark, sf_dir: str, out: str, copies: int) -> None:
    from pyspark.sql import functions as F

    from bigdatamining_graduate_spark.sources.catalog import load_table

    shifts = {
        # join-preserving: orderkey shifts identically on both sides;
        # dimension FKs (custkey/partkey/suppkey/user_id) stay in range
        "orders": {"o_orderkey": 10**9},
        "lineitem": {"l_orderkey": 10**9},
        "events": {"event_id": 10**9},
    }
    for t in FACT_TABLES:
        base = load_table(spark, sf_dir, t)
        parts = []
        for k in range(copies):
            cols = [
                (F.col(c) + F.lit(k * s)).alias(c)
                if k else F.col(c)
                for c, s in shifts[t].items()
            ]
            keep = [c for c in base.columns if c not in shifts[t]]
            parts.append(base.select(*cols, *keep).select(base.columns))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.coalesce(16).write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def copy_dims(spark, sf_dir: str, out: str) -> None:
    from bigdatamining_graduate_spark.sources.catalog import load_table

    for t in DIM_TABLES:
        load_table(spark, sf_dir, t).coalesce(4).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )


EMB_SHIFT = 10**7  # preserves vec_id % 100 (the standing query predicate)


def scale_embeddings(spark, sf_dir: str, out: str, copies: int) -> None:
    """``embeddings`` ×N for the vector-index scale gates (round 9): copy
    k shifts ``vec_id`` by ``k * 10**7`` and ROTATES the embedding array
    by k positions.  Rotation is a coordinate permutation — an isometry
    — so every copy reproduces the original pairwise-similarity
    structure exactly (the recall geometry scales, it doesn't blur),
    while cross-copy similarities decorrelate.  The default 10x fixture
    keeps embeddings verbatim (``copy_dims``) so the pre-round-9 gates
    (q224 regression pin) are untouched; this writes the scaled table
    for a SEPARATE fixture dir."""
    from pyspark.sql import functions as F

    from bigdatamining_graduate_spark.sources.catalog import load_table

    base = load_table(spark, sf_dir, "embeddings")
    dim = len(base.select("embedding").first()[0])
    parts = []
    for k in range(copies):
        r = k % dim
        rolled = (
            F.col("embedding")
            if r == 0
            else F.concat(
                F.slice("embedding", r + 1, dim - r), F.slice("embedding", 1, r)
            )
        )
        parts.append(
            base.select(
                (F.col("vec_id") + k * EMB_SHIFT).alias("vec_id"),
                rolled.alias("embedding"),
                "label",
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    allp.coalesce(8).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/synth_sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--tables",
        nargs="*",
        default=None,
        help="subset: any of documents/facts/dims (default: all)",
    )
    args = ap.parse_args()

    from bigdatamining_graduate_spark.session import get_spark

    spark = get_spark(
        app_name="synth-scale",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    groups = set(args.tables or ["documents", "facts", "dims"])
    if "documents" in groups:
        scale_documents(spark, args.sf_dir, args.out, args.copies)
    if "facts" in groups:
        scale_facts(spark, args.sf_dir, args.out, args.copies)
    if "dims" in groups:
        copy_dims(spark, args.sf_dir, args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
