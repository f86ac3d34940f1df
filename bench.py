#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs a representative query per workload class at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints the
full record {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} first (also written to
BENCH_FULL.json), then a <500-char summary with the 5 slowest queries as
the FINAL line so a tail-limited capture still parses.

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
    "q99_gopher_quality_rules", # composite quality-rule scan (zero shuffle)
    "q101_shared_passages",     # verbatim-passage dedup (inverted index)
    "q106_bm25_search",         # lexical retrieval (filtered postings)
    "q107_part_pagerank",       # iterative graph mining (6 integer rounds)
    "q110_part_triangles",      # oriented-adjacency array_intersect closure
    "q108_small_qty_revenue",   # TPC-H Q17 correlated-agg join shape
    "q111_embedding_quantization",  # zero-shuffle int8 vector codes
    "q113_skipgram_pairs",      # window co-occurrence pair extraction
    "q127_nation_market_share", # TPC-H Q8 share-of-parent windowed star join
    "q129_semdedup_discards",   # bucketed semantic-dedup discard decisions
    "q132_peak_concurrency",    # sweep-line peak via split prefix sum
    "q133_mad_outliers",        # two-pass robust MAD outlier scan
    "q141_volume_shipping",     # TPC-H Q7 double-nation-dim star join
    "q146_ppjoin_pairs",        # prefix-filtered exact set-similarity join
    "q157_forecast_revenue_change",  # TPC-H Q6 scan-only triple-range sum
    "q160_waiting_supplier",    # TPC-H Q21 per-order-agg rewrite (no self-joins)
    "q165_zorder_roundtrip",    # z-order sink write + read-back + filtered agg
    "q166_datasource_roundtrip",  # custom Python DataSource write/read round-trip
    "q167_bucketed_join_roundtrip",  # bucketed write + shuffle-free SMJ read-back
    "q168_cmsketch_heavy_hitters",  # count-min sketch token heavy hitters
    "q169_part_communities",    # synchronous LPA community detection
    "q170_part_kcore",          # synchronous k-core peel to fixed point
    "q171_mincost_supplier",    # TPC-H Q2 argmin decorrelated to struct-min agg
    "q174_profit_by_nation_year",  # TPC-H Q9 widest star, formula-bound supplycost
    "q175_part_bfs_hops",       # frontier-loop BFS hop distance
    "q176_shipmode_priority",   # TPC-H Q12 derived-shipmode dual conditional count
    "q177_context_packing",     # sharded length-bucket context packing
    "q179_scd2_user_tiers",     # SCD2 versioned history (CDC compaction shape)
    "q181_token_stats_hof",     # zero-explode HOF doc-grained token stats
    "q183_position_attribution",  # struct-min conversion + per-user position windows
    "q185_bigram_lm_quality",   # corpus bigram LM scoring (vocab joins + 1-row V)
    "q187_token_entropy",       # per-doc Shannon entropy (doc-local window)
    "q188_containment_pairs",   # asymmetric inverted-index containment join
    "q189_snapshot_diff",       # two-snapshot full-outer change data feed
    "q190_session_window_batch",  # native session_window aggregation
    "q191_portable_hll_users",  # portable 512-register HLL build + estimate
    "q193_hll_merge_rollup",    # weekly HLL shards + register-max merge
    "q194_ndcg_ranking_eval",   # graded nDCG@10 offline ranking metric
    "q196_histogram_quantiles",  # mergeable equi-width histogram sketch
    "q197_top_session_paths",   # ordered per-session path strings + top-k
    "q198_table_checksums",     # bucketed reconciliation digests
    "q200_join_key_skew_report",  # count-of-counts Gini skew diagnostics
    "q204_join_size_estimate",  # exact + uniform + skew-aware cardinality
    "q211_shard_rebalance_cost",  # rendezvous-vs-mod resize movement
    "q217_scd2_point_in_time_join",  # SCD2 history consumed leakage-free
    "q223_multiset_setops",     # intersectAll/exceptAll bag-semantics twins
    "q224_lsh_rerank_topk",     # two-stage ANN: LSH candidates + exact rerank
    "q225_bloom_prefilter",     # portable Bloom bits + broadcast membership probe
    "q226_prefixspan_patterns", # PrefixSpan sequential pattern mining
    "q227_incremental_lsh_pairs",  # incremental MinHash-LSH maintenance
    "q228_incremental_components",  # incremental CC via contraction graph
    "q229_delete_aware_components",  # deletion-side bounded reclose
    "q230_stream_incremental_lsh",  # foreachBatch LSH maintenance (stream == batch)
    "q231_upsert_aware_lsh",    # content-change maintenance (stale drop + re-band)
    "q232_upsert_aware_components",  # two-phase split+merge label maintenance
    "q233_incremental_ivf_assign",  # frozen-quantizer IVF index maintenance
    "q234_ivf_retrain_trigger", # exact-integer drift/overload retrain audit
    "q235_store_vacuum_refresh",  # tombstone GC + compaction + refresh read-back
    "q236_delete_aware_ivf",    # postings tombstone filter + occupancy audit
    "q237_upsert_aware_ivf",    # re-embedded slice reassign under frozen quantizer
    "q238_stream_incremental_ivf",  # foreachBatch IVF maintenance (stream == batch)
    "q239_ivf_store_vacuum",    # postings GC + compaction + refresh read-back
    "q240_filtered_ann_topk",   # label-partitioned pre-filtered ANN
    "q241_rrf_hybrid_search",   # BM25 + vector reciprocal-rank fusion
    "q242_incremental_bm25",    # inverted-index insert maintenance
    "q243_delete_aware_bm25",   # inverted-index tombstone + rescore
    "q244_upsert_aware_bm25",   # inverted-index stale-drop + re-index changed
    "q245_stream_incremental_bm25",  # foreachBatch index accretion (stream == batch)
    "q246_incremental_triangles",  # graph-family delta maintenance (carried + attributed)
    "q247_delete_aware_triangles",  # weighted-store edge death + destruction attribution
    "q248_stream_incremental_triangles",  # per-trigger delta attribution (stream == prefix recomputes)
    "q249_ivf_retrain_refresh",   # trigger-consuming quantizer refit + atomic swap
    "q250_triangle_store_vacuum", # weighted-edge GC rewrite + post-vacuum refresh
    "q251_full_vocab_bm25",       # pruned posting-list read off the full-vocab store
    "q252_incremental_phash_pairs",  # phash insert maintenance (batch-only fingerprinting)
    "q253_delete_aware_phash_pairs", # phash delete (anti-filters ARE the maintenance)
    "q254_upsert_aware_phash_pairs", # phash upsert (changed payloads re-fingerprint)
    "q255_stream_incremental_phash", # phash stream (per-trigger chunk join vs store)
    "q256_phash_store_vacuum",    # phash store GC + post-vacuum refresh
    "q257_incremental_agg_view",  # OLAP view insert (associative partial combine)
    "q258_delete_aware_agg_view", # OLAP view delete (decimal retraction + bounded max re-scan)
    "q259_upsert_aware_agg_view", # OLAP view upsert (retract old + add new partials)
    "q260_stream_agg_view",       # OLAP view stream (partials per trigger, combine-on-read)
    "q261_agg_view_vacuum",       # OLAP store compaction (retraction partials netted out)
    "q262_scd2_incremental_merge",  # SCD2 MERGE from the current row only
    "q263_derived_quarterly_view",  # lattice edge: quarterly served from the monthly view
    "q264_stream_scd2_merge",     # chained per-trigger SCD2 merges (state-version-per-batch)
    "q265_scd2_late_backfill",    # out-of-order arrivals: bounded per-user re-derivation
    "q266_store_gc_trigger",      # dead-row basis-point audit that fires the vacuums
    "q267_triggered_store_vacuum",  # trigger-consuming conditional vacuum (mixed-state refresh)
    "q268_scd2_gdpr_erase",       # SCD2 user erasure: store rewrite + merge off erased store
    "q269_bm25_store_vacuum",     # inverted-index GC (layout-preserving tf compaction)
    "q270_upsert_aware_triangles",  # graph upsert: support up AND down in one pass
    "q271_atomic_cross_store_publish",  # sig+pair refresh behind one pointer flip
    "q272_published_version_diff",  # CDC read: diff two immutable published versions
    "q273_scd2_horizon_compaction",  # history retention pruning + merge off compacted store
    "q274_maintained_quarterly_view",  # monthly merge -> quarterly re-derivation chained
    "q275_stream_published_store",  # per-trigger pointer commits (functional version chain)
    "q276_publish_version_gc",    # retention GC over the publish root + pointer serving
    "q277_schema_evolved_store",  # mixed-schema mergeSchema read across store generations
    "q278_manifest_pruned_rollup",  # incremental stats manifest + file-pruned serving read
    "q279_incremental_join_view",   # join-view delta rule (ΔO⋈C ∪ O⋈ΔC ∪ ΔO⋈ΔC)
    "q280_join_view_delete_ripple",  # dimension-erasure ripple via store anti-joins
    "q281_distinct_count_view",     # refcounted distinct-count view maintenance
    "q282_incremental_sessions",    # session-store merge from final sessions only
    "q283_delete_aware_sessions",   # bounded per-user re-derivation (bridge splits)
    "q284_stream_session_merge",    # chained per-trigger session merges
    "q285_join_view_upsert_ripple",  # re-segmented dimension moves view rows between groups
    "q286_distinct_view_vacuum",    # refcount store net + rename-swap + refresh
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

    # Steady-state methodology: each query runs once cold, then THREE times
    # in the warm JVM, and the warm MEDIAN is recorded (min alongside). The
    # cold run pays one-time Catalyst analysis + whole-stage-codegen
    # (Janino) compilation — a per-plan constant that amortizes to zero at
    # scale; the warm runs measure the data path, which is what scales with
    # SF. Median-of-3 (not a single sample) because a single warm sample is
    # load-sensitive: round 2 recorded q01 at 6.5 s warm vs 2.0 s cold in
    # the SAME session purely from machine load.
    from bigdatamining_graduate_spark.checkpoints import release_checkpoints

    timings: dict[str, float] = {}
    warm_min: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        # checkpointing queries (q26/q71/q78/q107/q110/q168/q169...)
        # materialize executor-storage blocks; the engine's checkpoint
        # ledger frees them deterministically once the consuming action is
        # done — the contract any long-lived pipeline uses (replaces the
        # round-5 per-query forced-GC workaround, which freed the same
        # blocks only as a garbage-collection side effect)
        release_checkpoints()
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            release_checkpoints()
        timings[name] = round(sorted(samples)[1], 3)
        warm_min[name] = round(min(samples), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    full = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_min": warm_min,
        "min_total": round(sum(warm_min.values()), 3),
        "queries_cold": cold,
        "cold_total": round(sum(cold.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The driver records only the TAIL of stdout (round 3 lost the whole
    # per-query map when the single JSON line outgrew the 2000-char
    # capture).  Emit the full record FIRST (and to a sidecar file), then
    # a compact summary — totals + the 5 slowest queries — as the FINAL
    # line, small enough (<500 chars) to always survive the tail.
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(sidecar, "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps(full))
    worst5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    summary_line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": full["value"],
            "unit": "sec",
            "queries": worst5,
            "n_queries": len(timings),
            "cold_total": full["cold_total"],
            "min_total": full["min_total"],
            "sf": full["sf"],
            "full_record": "BENCH_FULL.json",
        }
    )
    if len(summary_line) >= 500:  # enforce the tail-capture budget: drop
        # the slowest-query names rather than risk the driver truncating
        summary_line = json.dumps(
            {
                "metric": "headline_queries_total",
                "value": full["value"],
                "unit": "sec",
                "queries": {},
                "n_queries": len(timings),
                "cold_total": full["cold_total"],
                "sf": full["sf"],
                "full_record": "BENCH_FULL.json",
            }
        )
    assert len(summary_line) < 500, "summary line outgrew the tail budget"
    print(summary_line)


if __name__ == "__main__":
    main()
