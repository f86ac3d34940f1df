#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs a representative query per workload class at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Materialization is a noop-sink write (everything computes, nothing lands
on disk) so timings measure the full plan, not show()/count() shortcuts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdatamining_graduate_spark.session import get_spark  # noqa: E402

#: one per workload class (SURVEY.md §2 / the training-pipeline extensions)
HEADLINE = [
    "q01_pricing_summary",      # scan + multi-agg
    "q03_minmax_normalize",     # global bounds + broadcast normalize
    "q06_revenue_by_nation",    # star join
    "q14_top5_words_per_lang",  # explode + agg + window rank
    "q15_best_order_per_customer",  # row_number top-1
    "q17_hourly_event_stats",   # time rollup
    "q20_wordcount_top100",     # flagship text agg
    "q25_ngram_jaccard_pairs",  # inverted-index dedup join
    "q26_minhash_lsh_pairs",    # sketch dedup
    "q29_knn_bruteforce",       # similarity search
    "q31_tfidf_top_terms",      # tf-idf + per-doc top-k
    "q36_stream_hourly_counts", # structured streaming window agg
    "q44_last_signup_asof",     # as-of via running conditional max
    "q47_stream_session_windows",  # streaming session windows
    "q62_clicks_before_error",  # binned interval (range) join
    "q63_curated_corpus",       # end-to-end corpus curation pipeline
    "q71_neardup_components",   # iterative connected-component dedup clusters
    "q74_ann_recall",           # ANN recall@k vs brute-force ground truth
    "q78_shard_packing",        # token-budget packing via two-pass prefix sum
    "q80_benchmark_decontaminate",  # n-gram overlap vs held-out benchmark
    "q86_boilerplate_lines",    # line-level boilerplate removal + reassembly
    "q87_zorder_layout",        # Z-order multi-dim layout audit
    "q88_pmi_collocations",     # PMI-scored collocation mining
    "q89_frequent_itemsets",    # FPGrowth association mining
    "q94_shipping_priority",    # TPC-H Q3 selective star join
    "q95_large_volume_customers",  # TPC-H Q18 HAVING-subquery semi join
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bdm-bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    from bigdatamining_graduate_spark.plans.queries import QUERIES

    # JVM/codegen warmup on the smallest fixture (not measured)
    QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    # Steady-state methodology: each query runs twice in the warm JVM and
    # the SECOND run is recorded. Run 1 pays one-time Catalyst analysis +
    # whole-stage-codegen (Janino) compilation — a per-plan constant that
    # amortizes to zero at scale; run 2 measures the data path, which is
    # what scales with SF. Cold totals are reported alongside.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_cold": cold,
                "cold_total": round(sum(cold.values()), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
