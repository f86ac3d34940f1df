"""ε-bounded quality gates for the MLlib queries with no cross-engine oracle.

q32-q35 are rows-only in the driver's CORRECTNESS check (model outputs are
not SQL-expressible, SURVEY.md §7.4 risk 6). These tests pin the quality
dimension instead, mirroring the reference's own acceptance style — hw4
prints its ALS RMSE (``hw4/hw4.py:182``) and the FinalProject notebook
records model accuracies (``FinalProject/BDM_Final_Model.ipynb`` cells
19/24/30) — with bounds calibrated on the fixtures and generous headroom so
they fail on real breakage (wrong scale, degenerate fit, empty output), not
on seed drift.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from bigdatamining_graduate_spark.ml import pipelines as P
from bigdatamining_graduate_spark.plans.queries import QUERIES
from bigdatamining_graduate_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def test_als_rmse_bounded_and_recs_well_formed(spark):
    """q32 quality gate. With the reference's parity hyperparameters
    (maxIter=5, regParam=0.01) on the sparse TPC-H ratings the fit
    underperforms the mean predictor (measured RMSE ≈ 2.3× test stddev at
    sf0.001) — the bound is a REGRESSION gate against scale blowups and
    NaN predictions, not a skill claim. Also pins the recommendation
    contract: exactly k recs per user, finite scores."""
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    recs, rmse = P.als_recommendations(orders, li, k=5, with_rmse=True)

    assert math.isfinite(rmse) and rmse > 0.0
    ratings = P.build_ratings(orders, li)
    _, test = ratings.randomSplit([0.8, 0.2], seed=P.SEED)
    sd = test.agg(F.stddev_pop("rating")).collect()[0][0]
    assert rmse < 3.0 * sd, f"rmse {rmse} vs test stddev {sd}"

    per_user = recs.groupBy("user_id").count()
    mn, mx = per_user.agg(F.min("count"), F.max("count")).collect()[0]
    assert mn == mx == 5
    n_bad = recs.filter(
        F.col("score").isNull() | F.isnan("score")
    ).count()
    assert n_bad == 0


def test_als_surfaces_well_formed(spark):
    """q222 quality gate (M11 closure). For each of the four surfaces:
    * every subject has exactly k recs, ranked 1..k;
    * scores are finite and non-increasing in rank within a subject;
    * the subset surfaces cover exactly the requested deterministic
      subsets (n_subset smallest ids that survived coldStartStrategy);
    * subset recs AGREE with the corresponding all-* surface on common
      subjects (same model, same top-k)."""
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    k, n_subset = 5, 25
    rows = P.als_recommendation_surfaces(orders, li, k=k, n_subset=n_subset).collect()
    by_surface: dict[str, dict[int, list]] = {}
    for r in rows:
        assert math.isfinite(r["score"]), r
        by_surface.setdefault(r["surface"], {}).setdefault(r["subject_id"], []).append(r)
    assert set(by_surface) == {"all_users", "all_items", "user_subset", "item_subset"}
    for surface, subjects in by_surface.items():
        for sid, recs in subjects.items():
            assert sorted(r["rank"] for r in recs) == list(range(1, k + 1)), (surface, sid)
            ordered = sorted(recs, key=lambda r: r["rank"])
            for a, b in zip(ordered, ordered[1:]):
                assert a["score"] >= b["score"] - 1e-9, (surface, sid)
    # subset surfaces: exactly the n_subset smallest ids (all survive —
    # the subsets are drawn from the ratings table itself, and the factor
    # matrices cover every train id; cold-start drop applies to transform)
    ratings = P.build_ratings(orders, li)
    train, _ = ratings.randomSplit([0.8, 0.2], seed=P.SEED)
    train_users = {r["user"] for r in train.select("user").distinct().collect()}
    train_items = {r["item"] for r in train.select("item").distinct().collect()}
    want_users = {
        r["user"]
        for r in ratings.select("user").distinct().orderBy("user").limit(n_subset).collect()
    } & train_users
    want_items = {
        r["item"]
        for r in ratings.select("item").distinct().orderBy("item").limit(n_subset).collect()
    } & train_items
    assert set(by_surface["user_subset"]) == want_users
    assert set(by_surface["item_subset"]) == want_items
    # same model ⇒ the subset surface is a restriction of the all-surface
    for sub, full in (("user_subset", "all_users"), ("item_subset", "all_items")):
        for sid in by_surface[sub]:
            got = {(r["rank"], r["rec_id"]) for r in by_surface[sub][sid]}
            want = {(r["rank"], r["rec_id"]) for r in by_surface[full][sid]}
            assert got == want, (sub, sid)


def test_als_surfaces_deterministic(spark):
    """q222 determinism gate: two independent fits (same seed) produce
    the identical (surface, subject, rank, rec) table — the engine-wide
    seeding discipline the reference lacks (``hw4/hw4.py:169`` unseeded)."""
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")

    def key_set(df):
        return {
            (r["surface"], r["subject_id"], r["rank"], r["rec_id"])
            for r in df.collect()
        }

    a = key_set(P.als_recommendation_surfaces(orders, li, k=3, n_subset=10))
    b = key_set(P.als_recommendation_surfaces(orders, li, k=3, n_subset=10))
    assert a == b


def test_kmeans_partition_is_exhaustive(spark):
    """q33 quality gate: cluster sizes PARTITION the corpus — they sum to
    exactly n rows, every cluster is non-empty, and there are at most k
    clusters (KMeans may converge to fewer)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    sizes = [r["size"] for r in P.kmeans_cluster_sizes(emb, k=8).collect()]
    assert sum(sizes) == n
    assert all(s >= 1 for s in sizes)
    assert 1 <= len(sizes) <= 8


def test_pca_variance_monotone_and_substochastic(spark):
    """q35 quality gate: explained-variance ratios come out of an
    eigendecomposition, so they are non-negative, non-increasing in
    component order, and sum to ≤ 1."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = sorted(P.pca_variance(emb, k=8).collect(), key=lambda r: r["component"])
    vs = [r["variance"] for r in rows]
    assert len(vs) == 8
    assert all(v >= 0.0 for v in vs)
    assert all(vs[i] >= vs[i + 1] - 1e-12 for i in range(len(vs) - 1))
    assert sum(vs) <= 1.0 + 1e-9


def test_mllib_minhash_recalls_verified_pairs(spark):
    """q34 quality gate: the MLlib approxSimilarityJoin route must
    rediscover the pairs the engine's own (oracle-verified) MinHash+LSH
    q26 finds at the same 0.5 Jaccard threshold. Featurizations differ
    (MLlib tokenizes to word sets; q26 uses word n-grams) so containment
    is not exact — measured recall 0.96 at sf0.001 / 1.0 at sf0.01;
    bound at 0.85."""
    q26 = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q26_minhash_lsh_pairs"](spark, SF_SMOKE).collect()
    }
    assert q26, "q26 found no pairs — fixture drifted"
    q34 = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q34_mllib_minhash_pairs"](spark, SF_SMOKE).collect()
    }
    recall = len(q26 & q34) / len(q26)
    assert recall >= 0.85, f"recall {recall} ({len(q26)} verified pairs)"


def test_lang_classifier_acceptance(spark):
    """q91 hard acceptance gate (the last rows-only query without one).

    The LR language classifier has no cross-engine oracle (iterative
    MLlib fit), so pin it reference-style, mirroring how the FinalProject
    notebook records its model accuracies as the acceptance artifact:

    * **confusion-row structure**: the per-lang ``n_test`` counts must
      equal the independently recomputed held-out class counts of the
      seeded hash split (pmod(xxhash64(doc_id), 5) == 4 over docs with
      non-null text+lang) — i.e. every test doc is scored exactly once;
    * ``0 <= n_correct <= n_test`` and ``accuracy`` consistent with them;
    * **quality**: overall held-out accuracy >= 0.10 (fixture languages
      share one vocabulary, so the honest signal is ~chance = 0.2 over 5
      classes — measured 0.234 at sf0.001; 0.10 is breakage headroom
      that fails on a wrong-scale/garbage fit, not on seed drift), and
      the class-balanced fit must NOT have collapsed to one class: at
      least 3 languages need a correct prediction (measured: all 5)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    expected = {
        r["lang"]: r["n"]
        for r in docs.filter(F.col("text").isNotNull() & F.col("lang").isNotNull())
        .filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 4)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = QUERIES["q91_lang_classifier"](spark, SF_SMOKE).collect()
    assert {r["lang"] for r in rows} == set(expected)
    for r in rows:
        assert r["n_test"] == expected[r["lang"]], (r["lang"], r["n_test"])
        assert 0 <= r["n_correct"] <= r["n_test"], (r["lang"], r["n_correct"])
        assert abs(r["accuracy"] - round(r["n_correct"] / r["n_test"], 4)) < 1e-9
    total = sum(r["n_test"] for r in rows)
    correct = sum(r["n_correct"] for r in rows)
    assert correct / total >= 0.10, f"held-out accuracy {correct / total:.3f}"
    assert sum(1 for r in rows if r["n_correct"] > 0) >= 3, (
        "fit collapsed despite class-balanced weights: "
        + str({r['lang']: r['n_correct'] for r in rows})
    )


def check_hll_accuracy(spark, sf_dir):
    """q139 ε-gate body, parameterized by fixture dir so the opt-in 10x
    scale gate (tests/test_scale_gate.py) reruns it unchanged."""
    ev = load_table(spark, sf_dir, "events")
    week = F.expr("unix_micros(ts) div 86400000000 div 7")
    exact = {
        (r["week"], r["event_type"]): r["n"]
        for r in ev.groupBy(week.alias("week"), "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = QUERIES["q139_hll_weekly_rollup"](spark, sf_dir).collect()
    assert len(approx) == len(exact)
    for r in approx:
        ex = exact[(r["week"], r["event_type"])]
        assert abs(r["approx_users"] - ex) <= max(2, 0.10 * ex), (
            r["week"], r["event_type"], r["approx_users"], ex,
        )


def test_hll_weekly_rollup_accuracy(spark):
    """q139 quality gate: weekly distinct-user estimates from MERGED
    daily HLL sketches must land within 10% of the exact weekly
    distincts (Datasketches HLL at default lgK=12 gives ~1.6% relative
    standard error; 10% is breakage headroom, not tuning), over the
    same (week, type) cells."""
    check_hll_accuracy(spark, SF_SMOKE)


def check_kll_accuracy(spark, sf_dir):
    """q162 ε-gate body, parameterized for the 10x scale gate."""
    o = load_table(spark, sf_dir, "orders")
    bounds = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, array(0.47, 0.53))").alias("p50b"),
            F.expr("percentile(o_totalprice, array(0.87, 0.93))").alias("p90b"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    rows = QUERIES["q162_kll_price_quantiles"](spark, sf_dir).collect()
    assert len(rows) == len(bounds)
    for r in rows:
        b = bounds[r["o_orderpriority"]]
        assert r["n_orders"] == b["n"]
        lo, hi = b["p50b"]
        assert lo <= r["p50_value"] <= hi, (r["o_orderpriority"], r["p50_value"], lo, hi)
        lo, hi = b["p90b"]
        assert lo <= r["p90_value"] <= hi, (r["o_orderpriority"], r["p90_value"], lo, hi)


def test_kll_price_quantiles_accuracy(spark):
    """q162 quality gate: per-priority p50/p90 estimates from MERGED
    daily KLL sketches must land within 3% RANK error of the exact
    distribution (Datasketches KLL at default k=200 guarantees ~1.3%
    rank error with 99% confidence; 3% is breakage headroom). Checked
    by rank, not by value: the estimate must sit between the exact
    quantiles at rank q-0.03 and q+0.03."""
    check_kll_accuracy(spark, SF_SMOKE)


def check_theta_accuracy(spark, sf_dir):
    """q163 ε-gate body, parameterized for the 10x scale gate."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    users = {
        r["event_type"]: set(r["us"])
        for r in ev.groupBy("event_type")
        .agg(F.collect_set("user_id").alias("us"))
        .collect()
    }
    rows = QUERIES["q163_theta_segment_overlap"](spark, sf_dir).collect()
    n_types = len(users)
    assert len(rows) == n_types * (n_types - 1) // 2
    for r in rows:
        a, b = users[r["type_a"]], users[r["type_b"]]
        for col, exact in (
            ("both_users", len(a & b)),
            ("either_users", len(a | b)),
            ("only_a_users", len(a - b)),
        ):
            assert abs(r[col] - exact) <= max(2, 0.10 * exact), (
                r["type_a"], r["type_b"], col, r[col], exact,
            )


def test_theta_segment_overlap_accuracy(spark):
    """q163 quality gate: pairwise |A∩B| / |A∪B| / |A\\B| estimates
    from per-type theta sketches must land within 10% of the exact
    distinct-user set sizes (theta at default lgK=12 keeps every hash
    until 4096 distincts, so small cells are near-exact; 10% covers the
    sampled regime), for every type pair."""
    check_theta_accuracy(spark, SF_SMOKE)
