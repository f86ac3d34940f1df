"""Opt-in 10x scale gate: ``pytest -m scale``.

Round 3 validated the iterative/sketch layer at 10x (and 100x) as one-off
recorded experiments (SCALE.md §6e-§6j, commits 1c6c843/1060f99/f3c8ac7).
This file makes the 10x half REPEATABLE: it regenerates the synthetic 10x
fixture from sf0.1 with ``tools/synth_scale.py`` (bijective token remap for
documents, join-preserving key shifts for facts, dims verbatim) and asserts

* **hash-match vs the DuckDB oracle** for the iterative class — q71
  near-dup connected components, q107 integer PageRank, q110 triangle
  counts — the queries where AQE re-planning, partition counts, or loop
  convergence could plausibly change RESULTS (not just plans) at scale;
* the **sketch-family ε-gates** (q139 HLL, q162 KLL, q163 theta) rerun
  against the 10x fixture — the mergeable-state substitute for exact
  re-scans at 100 TB must keep its error bounds as partition counts and
  merge fan-in grow.

Excluded from the default run via pytest.ini addopts (regeneration plus
the six checks take a few minutes); CI-style invocation:

    python -m pytest tests/test_scale_gate.py -m scale -q
"""

from __future__ import annotations

import pytest

from bigdatamining_graduate_spark.plans.queries import ORACLE, QUERIES
from tests.oracle import assert_matches
from tests.test_ml_quality import (
    check_hll_accuracy,
    check_kll_accuracy,
    check_theta_accuracy,
)

pytestmark = pytest.mark.scale

SYNTH_DIR = "/tmp/synth_sf1"
BASE_SF_DIR = "/root/testdata/sf0.1"
COPIES = 10

#: iterative queries hash-matched against their embedded DuckDB oracle
ITERATIVE = [
    "q71_neardup_components",
    "q107_part_pagerank",
    "q110_part_triangles",
    "q169_part_communities",
    "q170_part_kcore",
    "q175_part_bfs_hops",
]


@pytest.fixture(scope="module")
def synth_dir(spark):
    """Regenerate the 10x fixture (all three table groups) from sf0.1."""
    from tools.synth_scale import copy_dims, scale_documents, scale_facts

    scale_documents(spark, BASE_SF_DIR, SYNTH_DIR, COPIES)
    scale_facts(spark, BASE_SF_DIR, SYNTH_DIR, COPIES)
    copy_dims(spark, BASE_SF_DIR, SYNTH_DIR)
    return SYNTH_DIR


#: streaming chained-window family at 10x — the stateful-operator class
#: where watermark frontiers, state-store partitioning, and multi-level
#: window chaining could change RESULTS as event volume grows (round-4
#: verdict item: the stream family's scale gate)
STREAMING = [
    "q136_stream_dedup_watermarked",
    "q137_stream_daily_peak_rate",
    # round 6: stream-maintained HLL registers — bounded monotone state
    # must still equal the batch derivation at 10x event volume
    "q209_stream_hll_registers",
]


@pytest.mark.parametrize("name", ITERATIVE)
def test_iterative_hash_match_at_10x(spark, synth_dir, name):
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


@pytest.mark.parametrize("name", STREAMING)
def test_streaming_hash_match_at_10x(spark, synth_dir, name):
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_cmsketch_hash_match_at_10x(spark, synth_dir):
    """q168 at 10x the token stream: the sketch stays 4x512 cells no
    matter the volume (the mergeable-state claim), and because its hash
    family is cross-engine portable the ESTIMATES — not just error
    bounds — must still hash-match DuckDB as partition counts and
    per-cell loads grow."""
    name = "q168_cmsketch_heavy_hitters"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


#: derived-relation TPC-H shapes at 10x — the partsupp/shipmode formula
#: columns are pure functions of keys, so scaling the FACT volume (shifted
#: orderkeys, in-domain part/supp keys) must leave the derivation and the
#: join/agg results in exact cross-engine agreement
TPCH_DERIVED = [
    "q174_profit_by_nation_year",
    "q176_shipmode_priority",
]


@pytest.mark.parametrize("name", TPCH_DERIVED)
def test_tpch_derived_hash_match_at_10x(spark, synth_dir, name):
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


#: round-5 text/window ops at 10x — q177's packing claim ("no global
#: window at any volume": partitions stay (bucket, shard)-bounded as the
#: corpus grows), q179's SCD2 versioning as per-user event chains grow,
#: q181's zero-shuffle HOF scan (token remap changes lengths, the
#: cross-engine agreement must not care)
TEXT_WINDOW = [
    "q177_context_packing",
    "q179_scd2_user_tiers",
    "q181_token_stats_hof",
]


@pytest.mark.parametrize("name", TEXT_WINDOW)
def test_text_window_hash_match_at_10x(spark, synth_dir, name):
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_incremental_lsh_hash_match_at_10x(spark, synth_dir):
    """q227 at 10x the corpus (round 8): the carried/fresh split must
    stay a partition of the full band-collision set as bucket
    populations and batch size grow 10x — hash-matched against the
    DuckDB twin, which recomputes the same incremental construction."""
    name = "q227_incremental_lsh_pairs"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_incremental_components_hash_match_at_10x(spark, synth_dir):
    """q228 at 10x: the contraction-graph labeling must equal the FULL
    recursive closure (its oracle) as component counts and batch size
    grow 10x — the merge-equals-recompute proof at scale."""
    name = "q228_incremental_components"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_delete_aware_components_hash_match_at_10x(spark, synth_dir):
    """q229 at 10x: the bounded reclose (only components touching a
    deletion re-run CC) must equal the FULL closure over the remaining
    corpus as cluster counts and the deletion slice grow 10x."""
    name = "q229_delete_aware_components"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_stream_incremental_lsh_hash_match_at_10x(spark, synth_dir):
    """q230 at 10x: three 10x-sized micro-batches through the
    foreachBatch signature-store maintenance must still emit exactly
    the full batch recompute (stream == batch as store size and
    per-trigger band-join volume grow 10x)."""
    name = "q230_stream_incremental_lsh"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_upsert_aware_lsh_hash_match_at_10x(spark, synth_dir):
    """q231 at 10x: carried (t0 store, unchanged x unchanged) plus
    refreshed (re-banded changed docs) must equal the full t1 recompute
    as the store and the changed slice grow 10x."""
    name = "q231_upsert_aware_lsh"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_upsert_components_hash_match_at_10x(spark, synth_dir):
    """q232 at 10x: the two-phase reclose+contract labeling must equal
    the FULL t1 closure as affected-component counts grow 10x."""
    name = "q232_upsert_aware_components"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_hll_rollup_epsilon_at_10x(spark, synth_dir):
    check_hll_accuracy(spark, synth_dir)


def test_kll_quantiles_epsilon_at_10x(spark, synth_dir):
    check_kll_accuracy(spark, synth_dir)


def test_theta_overlap_epsilon_at_10x(spark, synth_dir):
    check_theta_accuracy(spark, synth_dir)


#: round-6 portable-sketch + ops-diagnostics layer at 10x — q193's
#: register-max merge must keep hash-matching as weekly shard count and
#: per-register load grow; q196's bin counts merge by addition across
#: 10x the partitions; q198's reconciliation digests are the operator
#: whose WHOLE purpose is cross-copy agreement at scale; q200's
#: count-of-counts Gini must stay exact as key multiplicities shift
SKETCH_OPS_R6 = [
    "q193_hll_merge_rollup",
    "q196_histogram_quantiles",
    "q198_table_checksums",
    "q200_join_key_skew_report",
]


@pytest.mark.parametrize("name", SKETCH_OPS_R6)
def test_sketch_ops_hash_match_at_10x(spark, synth_dir, name):
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


#: round-7 additions at 10x — q223's multiplicity arithmetic must hold as
#: duplicate-tuple counts grow 10x; q224's bucket populations grow 10x...
#: no: embeddings are a DIMENSION (copied verbatim), so q224 is pinned for
#: REGRESSION (identical result), like q74's treatment in §6n; q225's
#: bloom words must reproduce bit-for-bit with a 10x probe side; q226's
#: precedence counts grow with (user, day) sequences
R7_OPS = [
    "q223_multiset_setops",
    "q224_lsh_rerank_topk",
    "q225_bloom_prefilter",
    "q226_prefixspan_patterns",
]


@pytest.mark.parametrize("name", R7_OPS)
def test_r7_ops_hash_match_at_10x(spark, synth_dir, name):
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


# -- round-9 additions: vector-index maintenance + store vacuum at 10x ------

SYNTH_IVF_DIR = "/tmp/synth_sf1_ivf"


@pytest.fixture(scope="module")
def synth_ivf_dir(spark, synth_dir):
    """The 10x VECTOR fixture: scaled embeddings (rotation-isometry
    copies — within-copy similarity structure exact, see
    tools/synth_scale.scale_embeddings) beside symlinks to the standard
    10x tables, so the oracle harness sees a complete table set while
    the pre-round-9 gates keep their verbatim-embeddings fixture."""
    import os

    from tools.synth_scale import scale_embeddings

    os.makedirs(SYNTH_IVF_DIR, exist_ok=True)
    scale_embeddings(spark, BASE_SF_DIR, SYNTH_IVF_DIR, COPIES)
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents",
    ):
        link = os.path.join(SYNTH_IVF_DIR, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(synth_dir, f"{t}.parquet"), link)
    return SYNTH_IVF_DIR


def test_incremental_ivf_hash_match_at_10x(spark, synth_ivf_dir):
    """q233 at 10x the vector corpus: carried ∪ fresh under the frozen
    quantizer must equal the full frozen assignment (its oracle) as
    cell populations, the seed pool, and the batch slice grow 10x."""
    name = "q233_incremental_ivf_assign"
    assert_matches(QUERIES[name](spark, synth_ivf_dir), ORACLE[name], synth_ivf_dir)


def test_ivf_retrain_trigger_hash_match_at_10x(spark, synth_ivf_dir):
    """q234 at 10x: the exact-integer drift/overload flags must stay
    cross-engine identical as per-cell sums approach the decimal(38,0)
    promotion's raison d'être."""
    name = "q234_ivf_retrain_trigger"
    assert_matches(QUERIES[name](spark, synth_ivf_dir), ORACLE[name], synth_ivf_dir)


def test_ivf_maintained_recall_at_10x(spark, synth_ivf_dir):
    """The judge-directed staleness bound AT SCALE: recall through the
    maintained index (frozen quantizer) >= recall through a full refit
    - eps, against brute-force ground truth, at 10x the corpus."""
    import bigdatamining_graduate_spark.operators.similarity as SIM
    from bigdatamining_graduate_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, synth_ivf_dir, "embeddings")
    pred = F.col("vec_id") % 1000 == 0  # ~50 queries at 10x
    truth = {
        (r.query_id, r.neighbor_id)
        for r in SIM.knn_bruteforce(emb, pred, k=5).collect()
    }
    assert truth

    def recall(df):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return len(got & truth) / len(truth)

    r_maint = recall(SIM.portable_ivf_search(emb, pred, k=5, nprobe=3, refit=False))
    r_refit = recall(SIM.portable_ivf_search(emb, pred, k=5, nprobe=3, refit=True))
    assert r_maint >= r_refit - 0.1, (r_maint, r_refit)


def test_store_vacuum_hash_match_at_10x(spark, synth_dir):
    """q235 at 10x the document corpus: the vacuumed-store refresh must
    equal the full incremental recompute over the remaining corpus as
    store size, tombstone count, and compaction volume grow 10x."""
    name = "q235_store_vacuum_refresh"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_delete_aware_ivf_hash_match_at_10x(spark, synth_ivf_dir):
    """q236 at 10x: the tombstone-filtered postings table must equal
    the full frozen assignment of the remaining corpus as cell
    occupancy and tombstone volume grow 10x."""
    name = "q236_delete_aware_ivf"
    assert_matches(QUERIES[name](spark, synth_ivf_dir), ORACLE[name], synth_ivf_dir)


def test_upsert_aware_ivf_hash_match_at_10x(spark, synth_ivf_dir):
    """q237 at 10x: carried ∪ refreshed under the t0-frozen quantizer
    must equal the full t1 assignment as the re-embedded slice grows
    10x (clamping included — more t1 values leave the frozen range)."""
    name = "q237_upsert_aware_ivf"
    assert_matches(QUERIES[name](spark, synth_ivf_dir), ORACLE[name], synth_ivf_dir)


def test_stream_ivf_hash_match_at_10x(spark, synth_ivf_dir):
    """q238 at 10x: three 10x-sized micro-batches against the persisted
    centroid store — stream emission must still equal the batch
    assignment under the batch-0-frozen quantizer."""
    name = "q238_stream_incremental_ivf"
    assert_matches(QUERIES[name](spark, synth_ivf_dir), ORACLE[name], synth_ivf_dir)


def test_ivf_store_vacuum_hash_match_at_10x(spark, synth_ivf_dir):
    """q239 at 10x: the vacuumed-index refresh must equal the full
    frozen assignment over the remaining corpus as postings volume,
    tombstone count, and compaction size grow 10x."""
    name = "q239_ivf_store_vacuum"
    assert_matches(QUERIES[name](spark, synth_ivf_dir), ORACLE[name], synth_ivf_dir)


def test_filtered_ann_hash_match_at_10x(spark, synth_ivf_dir):
    """q240 at 10x: the label-partitioned pre-filtered ANN must stay
    cross-engine exact as per-(band,bv,label) bucket populations grow."""
    name = "q240_filtered_ann_topk"
    assert_matches(QUERIES[name](spark, synth_ivf_dir), ORACLE[name], synth_ivf_dir)


def test_rrf_hybrid_hash_match_at_10x(spark, synth_ivf_dir):
    """q241 at 10x: both retrieval arms (posting-list-bounded BM25 and
    the 1xN anchor cosine scan) and the rank fusion must stay exact as
    corpus and posting lists grow 10x."""
    name = "q241_rrf_hybrid_search"
    assert_matches(QUERIES[name](spark, synth_ivf_dir), ORACLE[name], synth_ivf_dir)


def test_incremental_bm25_hash_match_at_10x(spark, synth_dir):
    """q242 at 10x the document corpus: merged-store search must equal
    the full-rebuild search as posting lists, dl table, and the global
    stats every score depends on grow 10x."""
    name = "q242_incremental_bm25"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_delete_aware_bm25_hash_match_at_10x(spark, synth_dir):
    """q243 at 10x: tombstoned-store search must equal the full rebuild
    over the remaining corpus — survivor scores shift exactly as the
    shrunk N/avgdl/df dictate."""
    name = "q243_delete_aware_bm25"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_upsert_aware_bm25_hash_match_at_10x(spark, synth_dir):
    """q244 at 10x: stale-drop + re-tokenize-the-changed-slice must
    equal the full t1 rebuild as revision volume grows 10x."""
    name = "q244_upsert_aware_bm25"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_stream_bm25_hash_match_at_10x(spark, synth_dir):
    """q245 at 10x: three 10x micro-batches accreting the dl/tf stores
    — accumulated-store search must still equal the batch recompute."""
    name = "q245_stream_incremental_bm25"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_incremental_triangles_hash_match_at_10x(spark, synth_dir):
    """q246 at 10x the fact table: carried + attributed delta must
    equal the full closure as edge count, degree, and the new-edge
    slice all grow — the attribution rule is exercised hardest where
    dense neighborhoods put many new edges in one triangle."""
    name = "q246_incremental_triangles"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_delete_aware_triangles_hash_match_at_10x(spark, synth_dir):
    """q247 at 10x: the weighted-store cd == w edge-death criterion and
    the destruction attribution must stay exact as support counts and
    the deleted slice grow 10x."""
    name = "q247_delete_aware_triangles"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_stream_triangles_hash_match_at_10x(spark, synth_dir):
    """q248 at 10x: three 10x-sized order micro-batches accreting the
    edge store — every trigger's delta attribution must still equal
    the prefix-graph recomputes."""
    name = "q248_stream_incremental_triangles"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


# -- round-10 additions: retrain loop, store GC, full-vocab index,
# -- phash matrix, aggregate-view matrix ------------------------------------


def test_ivf_retrain_refresh_hash_match_at_10x(spark, synth_ivf_dir):
    """q249 at 10x: the trigger-consuming refit + atomic swap +
    continued maintenance under the NEW quantizer must equal the full
    recompute under the refit quantizer as the drifted corpus and cell
    populations grow 10x."""
    name = "q249_ivf_retrain_refresh"
    assert_matches(QUERIES[name](spark, synth_ivf_dir), ORACLE[name], synth_ivf_dir)


def test_triangle_store_vacuum_hash_match_at_10x(spark, synth_dir):
    """q250 at 10x: the weighted-edge GC rewrite (support decrements,
    last-supporting-order deaths) + post-vacuum refresh must equal the
    full post-delete recompute as edge multiplicity grows 10x."""
    name = "q250_triangle_store_vacuum"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_full_vocab_bm25_hash_match_at_10x(spark, synth_dir):
    """q251 at 10x: the pruned posting-list read off the range-clustered
    full-vocabulary store must equal the full recompute as the
    vocabulary (token remap multiplies distinct tokens) and posting
    lists grow 10x — and the vocab_size audit column must track the
    10x corpus vocabulary exactly."""
    name = "q251_full_vocab_bm25"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


#: phash maintenance matrix at 10x — candidate generation is a 16-bit
#: chunk equi-join, so 10x docs means 10x bucket populations; every cell's
#: maintained result must still equal its full-recompute oracle
PHASH_MATRIX = [
    "q252_incremental_phash_pairs",
    "q253_delete_aware_phash_pairs",
    "q254_upsert_aware_phash_pairs",
    "q255_stream_incremental_phash",
    "q256_phash_store_vacuum",
]


@pytest.mark.parametrize("name", PHASH_MATRIX)
def test_phash_matrix_hash_match_at_10x(spark, synth_dir, name):
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


#: aggregate-view maintenance matrix at 10x — group keys (month x flag)
#: are volume-stable, so 10x rows means 10x per-group populations: the
#: exact-decimal retract/add algebra and bounded max re-scans must not
#: move a cent vs the full rollup
AGGVIEW_MATRIX = [
    "q257_incremental_agg_view",
    "q258_delete_aware_agg_view",
    "q259_upsert_aware_agg_view",
    "q260_stream_agg_view",
    "q261_agg_view_vacuum",
]


@pytest.mark.parametrize("name", AGGVIEW_MATRIX)
def test_aggview_matrix_hash_match_at_10x(spark, synth_dir, name):
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_scd2_merge_hash_match_at_10x(spark, synth_dir):
    """q262 at 10x: merge-from-current-row must equal the full q179
    history recompute as per-user event chains, batch-user counts, and
    version counts grow 10x — prefix-stability of version assignment is
    exactly what must survive scale."""
    name = "q262_scd2_incremental_merge"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_quarterly_derivation_hash_match_at_10x(spark, synth_dir):
    """q263 at 10x: the monthly->quarterly lattice edge (exact-decimal
    partial re-combination) must equal the direct corpus rollup as
    per-group populations grow 10x."""
    name = "q263_derived_quarterly_view"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_stream_scd2_merge_hash_match_at_10x(spark, synth_dir):
    """q264 at 10x: three chained store-version merges over 10x event
    volume must land exactly on the full q179 recompute (stream ==
    batch for chained stateful merges)."""
    name = "q264_stream_scd2_merge"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_scd2_late_backfill_hash_match_at_10x(spark, synth_dir):
    """q265 at 10x: carried ∪ per-user re-derivation must equal the
    full recompute as late-touched user counts and their event chains
    grow 10x."""
    name = "q265_scd2_late_backfill"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_store_gc_trigger_hash_match_at_10x(spark, synth_dir):
    """q266 at 10x: the dead-row basis-point audit must stay bit-exact
    as store row counts grow 10x (integer flag arithmetic — the q234
    rule applied to store GC)."""
    name = "q266_store_gc_trigger"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_triggered_vacuum_hash_match_at_10x(spark, synth_dir):
    """q267 at 10x: the conditional vacuum (sig fires, pair doesn't)
    plus mixed-state refresh must equal the incremental recompute over
    the remaining corpus as store sizes grow 10x."""
    name = "q267_triggered_store_vacuum"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


# -- round-11 additions: GDPR erasure, inverted-index GC, graph upsert,
# -- atomic publish, value-oracled portable-IVF kNN --------------------------


def test_scd2_gdpr_erase_hash_match_at_10x(spark, synth_dir):
    """q268 at 10x: the erased-store rewrite + survivor-filtered merge
    must equal the full recompute over surviving users as per-user
    histories and the erased-user slice grow 10x."""
    name = "q268_scd2_gdpr_erase"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_bm25_store_vacuum_hash_match_at_10x(spark, synth_dir):
    """q269 at 10x: postings GC + the range-clustered tf rewrite + the
    post-vacuum refresh must equal the full-vocab recompute over the
    remaining corpus as posting lists and the vocabulary grow 10x."""
    name = "q269_bm25_store_vacuum"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_upsert_triangles_hash_match_at_10x(spark, synth_dir):
    """q270 at 10x: the one-pass bidirectional support net + the two
    delta kernels must equal the full t1 recompute as edge multiplicity
    and the revised-order slice grow 10x — simultaneous create/destroy
    populations both scale."""
    name = "q270_upsert_aware_triangles"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_atomic_publish_hash_match_at_10x(spark, synth_dir):
    """q271 at 10x: the pointer-committed two-store refresh must equal
    the q235 identity (and resolve version 2) as both stores grow
    10x."""
    name = "q271_atomic_cross_store_publish"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_portable_ivf_knn_hash_match_at_10x(spark, synth_ivf_dir):
    """q55 at 10x (newly value-oracled): frozen-quantizer assignment,
    integer probe selection, and the exact cosine rerank must stay
    cross-engine exact as cell populations grow 10x."""
    name = "q55_ivf_knn"
    assert_matches(QUERIES[name](spark, synth_ivf_dir), ORACLE[name], synth_ivf_dir)


def test_version_diff_hash_match_at_10x(spark, synth_dir):
    """q272 at 10x: the physical v1/v2 directory diff must equal the
    logical snapshot diff as both published versions grow 10x."""
    name = "q272_published_version_diff"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_scd2_horizon_compaction_hash_match_at_10x(spark, synth_dir):
    """q273 at 10x: horizon pruning must commute with the store
    lifecycle and the subsequent merge as per-user version chains grow
    10x."""
    name = "q273_scd2_horizon_compaction"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_maintained_quarterly_hash_match_at_10x(spark, synth_dir):
    """q274 at 10x: the chained monthly-merge -> quarterly-derivation
    must equal the direct corpus rollup (maintenance and derivability
    commute) as per-group populations grow 10x."""
    name = "q274_maintained_quarterly_view"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_stream_published_store_hash_match_at_10x(spark, synth_dir):
    """q275 at 10x: three per-trigger pointer commits over 10x document
    volume must land exactly on the full-batch LSH recompute with the
    final version pinned."""
    name = "q275_stream_published_store"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_publish_version_gc_hash_match_at_10x(spark, synth_dir):
    """q276 at 10x: v3 publish + retain-2 GC + pointer serving must
    equal the refresh identity as all versions grow 10x."""
    name = "q276_publish_version_gc"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_schema_evolved_store_hash_match_at_10x(spark, synth_dir):
    """q277 at 10x: the mixed-schema mergeSchema read must stay
    lossless as both generations grow 10x."""
    name = "q277_schema_evolved_store"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


def test_manifest_pruned_rollup_hash_match_at_10x(spark, synth_dir):
    """q278 at 10x: incremental manifest maintenance + file pruning
    must stay lossless as file counts and row volumes grow 10x."""
    name = "q278_manifest_pruned_rollup"
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)


#: classical-IVM family at 10x (round-11 continuation): delta-rule join
#: view, dimension-delete ripple, refcounted distinct view, incremental
#: sessionization — the shapes where 10x volume changes term sizes
#: (delta joins), ripple fan-out (orders per erased customer), aux-store
#: cardinality (refcount pairs), and per-user session density
IVM_FAMILY = [
    "q279_incremental_join_view",
    "q280_join_view_delete_ripple",
    "q281_distinct_count_view",
    "q282_incremental_sessions",
    "q283_delete_aware_sessions",
    "q284_stream_session_merge",
    "q285_join_view_upsert_ripple",
    "q286_distinct_view_vacuum",
]


@pytest.mark.parametrize("name", IVM_FAMILY)
def test_ivm_family_hash_match_at_10x(spark, synth_dir, name):
    assert_matches(QUERIES[name](spark, synth_dir), ORACLE[name], synth_dir)
