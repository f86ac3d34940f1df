"""Embedding similarity search over ``array<float>`` columns.

The reference's similarity machinery is an O(n²) theta self-join over
MinMax-scaled ml vectors with a Python dot-product UDF
(``hw4/hw4.py:102-117,136-151``). Here:

* vectors stay plain ``array<double>`` columns — no VectorUDT, no UDF;
  dot/cosine are ``zip_with``+``aggregate`` built-ins (JVM, codegen);
* brute-force top-k is the CORRECTNESS baseline (still a cross join, but
  only queries × corpus, with TakeOrdered-style window pruning);
* the SCALE path is random-hyperplane LSH: bucket on sign bits of dot
  products against fixed seeded hyperplanes, then search only within the
  bucket — candidate generation is an equi-join on the bucket key.

Hyperplanes are literal constants (seeded numpy, rounded to 6 decimals)
shared verbatim with the DuckDB oracle SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V

EMBED_DIM = 64
#: banded sign-LSH geometry: a pair is a candidate if ALL bits of ANY band
#: agree (same banding trick as MinHash-LSH). 4 bands x 4 bits gives ~50%
#: recall at cosine 0.4 while pruning most of the pair space; at larger
#: corpus sizes raise bits-per-band to shrink buckets.
ANN_BANDS = 4
BITS_PER_BAND = 4
#: the WIDE geometry (same band count, 8-bit bands → 16× smaller buckets)
#: — the dial position for larger corpora; see SCALE.md §5 measurements
WIDE_BITS_PER_BAND = 8
N_PLANES = ANN_BANDS * WIDE_BITS_PER_BAND
_rng = np.random.RandomState(42)
#: fixed hyperplane POOL, rounded so the SQL literals are exact decimals.
#: Geometries slice a prefix: the first 16 planes are draw-order identical
#: to the original 4x4 layout, so the default geometry's results are
#: unchanged by the pool extension.
HYPERPLANES: list[list[float]] = [
    [round(float(x), 6) for x in _rng.randn(EMBED_DIM)] for _ in range(N_PLANES)
]


def _as_double(col) -> "F.Column":
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def knn_bruteforce(
    embeddings: DataFrame,
    query_pred,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for rows matching ``query_pred``.

    queries × corpus cross join; per-query top-k via row_number with a
    neighbor-id tiebreak (deterministic under near-ties). At scale the
    corpus side would be blocked by LSH (see :func:`ann_lsh`) — this is
    the exact baseline the approximate path is validated against.
    """
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    q = emb.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = q.crossJoin(emb.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")))
    pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    sim = V.cosine(F.col("qv"), F.col("nv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cos_sim"), "rnk")
    )


def knn_bruteforce_sql(query_pred_sql: str, k: int = 5) -> str:
    cos = V.cosine_sql("qv", "nv")
    return f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE {query_pred_sql}),
    pairs AS (
      SELECT query_id, e.vec_id AS neighbor_id, qv, e.v AS nv
      FROM q CROSS JOIN emb e
      WHERE query_id <> e.vec_id
    ),
    scored AS (
      SELECT query_id, neighbor_id, {cos} AS sim FROM pairs
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim, rnk FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rnk
      FROM scored)
    WHERE rnk <= {k}
    """


def _band_value_spark(vcol, band: int, bits: int = BITS_PER_BAND) -> "F.Column":
    """Packed sign bits of one band's hyperplanes."""
    out = None
    for k in range(bits):
        plane = HYPERPLANES[band * bits + k]
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(V.dot(vcol, p) >= 0, F.lit(1 << k).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        out = bit if out is None else out + bit
    return out


def _band_value_sql(vexpr: str, band: int, bits: int = BITS_PER_BAND) -> str:
    parts = []
    for k in range(bits):
        plane = HYPERPLANES[band * bits + k]
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        d = f"list_sum(list_transform(list_zip({vexpr}, {lit}), p -> p[1] * p[2]))"
        parts.append(
            f"(CASE WHEN {d} >= 0 THEN cast({1 << k} as bigint) ELSE cast(0 as bigint) END)"
        )
    return "(" + " + ".join(parts) + ")"


def ann_lsh_pairs(
    embeddings: DataFrame, min_sim: float, bits: int = BITS_PER_BAND
) -> DataFrame:
    """Approximate near-neighbor pairs via banded sign-LSH: score only
    pairs agreeing on ALL bits of SOME band. Candidate generation is an
    equi-join on (band, band_value) — the 100 TB-safe formulation of the
    reference's all-pairs theta join (``hw4/hw4.py:104-110``). ``bits``
    is the bucket-size dial: expected bucket population is n/2^bits, and
    per-band candidate work is quadratic IN THE BUCKET, so bits must grow
    ~log2(n) to keep total work near-linear (measured: 20k uniform
    vectors, 4-bit bands 81 s vs 8-bit bands — see SCALE.md §5)."""
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    bucketed = emb.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        _band_value_spark(F.col("v"), j, bits).alias("bv"),
                    )
                    for j in range(ANN_BANDS)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "v", "b.band", "b.bv")
    a = bucketed.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "band", "bv")
    b = bucketed.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "band", "bv")
    sim = V.cosine(F.col("va"), F.col("vb"))
    # score BEFORE deduplicating: a pair colliding in k bands is scored k
    # times (cheap JVM arithmetic) but the distinct then shuffles only
    # (id, id, sim) scalars — deduping first would shuffle the 64-dim
    # double arrays themselves (~16x more shuffle bytes). The sim
    # expression is MATERIALIZED by its own projection so the filter and
    # the rounded output don't each re-run the 64-dim aggregate.
    scored = (
        a.join(b, ["band", "bv"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim"))
    )
    return (
        scored.filter(F.col("sim") >= min_sim)
        .select("vec_a", "vec_b", F.round("sim", 6).alias("cos_sim"))
        .distinct()
    )


def ann_recall(embeddings: DataFrame, query_pred, k: int = 5) -> DataFrame:
    """Recall@k of the banded sign-LSH path against the exact brute-force
    ground truth — the "measure, don't guess" evaluation an ANN deployment
    needs before trusting its index. Per query: how many of the true top-k
    cosine neighbors the LSH buckets retrieve in THEIR top-k.

    Scale shape: the exact side is the expensive O(queries × corpus)
    baseline, so recall is evaluated on a query SAMPLE (``query_pred`` —
    here the same deterministic slice the exact query uses); the approx
    side reuses the production bucket equi-join, asymmetric (sampled
    queries × corpus) so it stays linear in corpus size. Output
    (query_id, n_true, n_hits, recall) — aggregate recall is
    sum(n_hits)/sum(n_true), left to the reader so per-query misses stay
    visible."""
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    bucketed = emb.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"), _band_value_spark(F.col("v"), j).alias("bv")
                    )
                    for j in range(ANN_BANDS)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "v", "b.band", "b.bv")
    qb = bucketed.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "band", "bv"
    )
    nb = bucketed.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"), "band", "bv")
    sim = V.cosine(F.col("qv"), F.col("nv"))
    cand = (
        qb.join(nb, ["band", "bv"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    approx = (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id")
    )
    truth = knn_bruteforce(embeddings, query_pred, k).select("query_id", "neighbor_id")
    # one left join + ONE aggregation: n_true and n_hits come out of the
    # same pass, so the expensive exact-kNN subtree is planned once (the
    # semi-join + separate count formulation duplicated it in the plan)
    hit = approx.withColumn("hit", F.lit(1))
    return (
        truth.join(hit, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_true"),
            F.count("hit").alias("n_hits"),
            F.round(F.count("hit") / F.count("*"), 6).alias("recall"),
        )
    )


def ann_recall_sql(query_pred_sql: str, k: int = 5) -> str:
    """DuckDB twin of :func:`ann_recall` (shares the hyperplane literals
    and both top-k tiebreaks with the Spark plan)."""
    cos_t = V.cosine_sql("qv", "nv")
    band_selects = "\n      UNION ALL ".join(
        f"SELECT vec_id, v, {j} AS band, {_band_value_sql('v', j)} AS bv FROM emb"
        for j in range(ANN_BANDS)
    )
    return f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE {query_pred_sql}),
    tpairs AS (
      SELECT query_id, e.vec_id AS neighbor_id, qv, e.v AS nv
      FROM q CROSS JOIN emb e WHERE query_id <> e.vec_id
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {cos_t} DESC, neighbor_id) AS rnk
        FROM tpairs)
      WHERE rnk <= {k}
    ),
    bucketed AS ({band_selects}),
    qb AS (SELECT vec_id AS query_id, v AS qv, band, bv FROM bucketed
           WHERE {query_pred_sql.replace("query_id", "vec_id")}),
    cand AS (
      SELECT DISTINCT query_id, b.vec_id AS neighbor_id, qv, b.v AS nv
      FROM qb JOIN bucketed b ON qb.band = b.band AND qb.bv = b.bv
                             AND query_id <> b.vec_id
    ),
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {cos_t} DESC, neighbor_id) AS rnk
        FROM cand)
      WHERE rnk <= {k}
    ),
    hits AS (
      SELECT t.query_id, count(*) AS n_hits
      FROM truth t JOIN approx a
        ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
      GROUP BY 1
    )
    SELECT t.query_id, count(*) AS n_true,
           coalesce(any_value(h.n_hits), 0) AS n_hits,
           round(coalesce(any_value(h.n_hits), 0) * 1.0 / count(*), 6) AS recall
    FROM truth t LEFT JOIN hits h ON t.query_id = h.query_id
    GROUP BY t.query_id
    """


def ann_lsh_pairs_sql(min_sim: float, bits: int = BITS_PER_BAND) -> str:
    cos = V.cosine_sql("va", "vb")
    band_selects = "\n      UNION ALL ".join(
        f"SELECT vec_id, v, {j} AS band, {_band_value_sql('v', j, bits)} AS bv FROM emb"
        for j in range(ANN_BANDS)
    )
    return f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bucketed AS ({band_selects}),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, a.v AS va, b.v AS vb
      FROM bucketed a JOIN bucketed b ON a.band = b.band AND a.bv = b.bv
                                     AND a.vec_id < b.vec_id
    ),
    scored AS (SELECT vec_a, vec_b, {cos} AS sim FROM cand)
    SELECT vec_a, vec_b, round(sim, 6) AS cos_sim
    FROM scored WHERE sim >= {min_sim}
    """


def lsh_rerank_topk(embeddings: DataFrame, query_pred, k: int = 5) -> DataFrame:
    """Two-stage retrieval — the production ANN shape (FAISS/ScaNN style):
    a cheap CANDIDATE stage (banded sign-LSH bucket equi-join, the q30
    generator) followed by an exact cosine RE-RANK of only the candidates,
    returning each query's top-k as (query_id, neighbor_id, rnk, cos_sim).

    This is the retrieval operator itself (q74/``ann_recall`` is the
    offline eval of the same two stages). Fully deterministic — fixed
    hyperplane literals, (cos DESC, neighbor_id) tiebreak — so unlike the
    IVF path (seeded KMeans quantizer, q55) it carries a complete DuckDB
    value oracle, not just a recall gate.

    Scale: stage-1 cost is bounded by bucket population (n/2^bits per
    band — the ``bits`` dial, SCALE.md §5); stage-2 is |candidates| dot
    products + a per-query top-k window — never a corpus scan per query.
    The queries themselves stay distributed (a filtered branch of the
    same bucketed table, reused via one checkpoint-free self-join)."""
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    bucketed = emb.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        _band_value_spark(F.col("v"), j).alias("bv"),
                    )
                    for j in range(ANN_BANDS)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "v", "b.band", "b.bv")
    q = bucketed.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "band", "bv"
    )
    cand = (
        q.join(bucketed, ["band", "bv"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "qv", F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        cand.select("query_id", "neighbor_id", V.cosine(F.col("qv"), F.col("nv")).alias("sim"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("sim", 6).alias("cos_sim"))
    )


def lsh_rerank_topk_sql(query_pred_sql: str, k: int = 5) -> str:
    """DuckDB twin of :func:`lsh_rerank_topk` (shared hyperplane literals
    and tiebreak)."""
    cos = V.cosine_sql("qv", "nv")
    band_selects = "\n      UNION ALL ".join(
        f"SELECT vec_id, v, {j} AS band, {_band_value_sql('v', j)} AS bv FROM emb"
        for j in range(ANN_BANDS)
    )
    return f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bucketed AS ({band_selects}),
    qb AS (SELECT vec_id AS query_id, v AS qv, band, bv FROM bucketed
           WHERE {query_pred_sql}),
    cand AS (
      SELECT DISTINCT query_id, qv, b.vec_id AS neighbor_id, b.v AS nv
      FROM qb JOIN bucketed b ON qb.band = b.band AND qb.bv = b.bv
                             AND query_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, rnk, round(sim, 6) AS cos_sim FROM (
      SELECT query_id, neighbor_id, {cos} AS sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY {cos} DESC, neighbor_id) AS rnk
      FROM cand)
    WHERE rnk <= {k}
    """


def ivf_knn(
    embeddings: DataFrame,
    query_pred,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 3,
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: a seeded KMeans coarse quantizer partitions the
    corpus into ``n_cells`` inverted lists; each query searches the
    ``nprobe`` nearest cells. nprobe is THE recall/cost dial (nprobe =
    n_cells degenerates to brute force): measured on the fixture
    embeddings at sf0.01, recall@5 is 0.20 / 0.52 / 0.88 at nprobe
    1 / 3 / 5 (see SCALE.md §5) — cosine neighbors routinely sit just
    across a Voronoi boundary, so single-cell search is never enough.

    Scale shape: after fit, the centroids become an n_cells-row BROADCAST
    TABLE; probe selection is a broadcast nested-loop of each query
    against it (×n_cells per query, then pruned to nprobe by a per-query
    window). A broadcast table — not a plan literal — because n_cells
    grows to ~sqrt(corpus) at scale (tens of thousands of cells at
    100 TB) and embedding-width × n_cells literals would blow up the
    serialized plan / Janino codegen; a few-MB broadcast is the right
    physical shape and keeps the probe join a broadcast at any n_cells.
    Candidate generation is the cell-id equi-join (queries × their
    nprobe inverted lists); corpus vectors keep their single
    euclidean-nearest cell from ``model.transform``, so candidates are
    naturally distinct. At 100 TB the inverted lists are bucketed
    storage.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    feats = emb.withColumn("features", array_to_vector("v"))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(feats)
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    assigned = model.transform(feats).select(
        "vec_id", "v", F.col("prediction").alias("cell")
    )
    corpus = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"), "cell"
    )
    cent_df = embeddings.sparkSession.createDataFrame(
        list(enumerate(centers)), "cell int, cv array<double>"
    )
    q0 = assigned.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    probes = q0.crossJoin(F.broadcast(cent_df))
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probed = (
        probes.select("query_id", "qv", "cell", d2.alias("d2"))
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    sim = V.cosine(F.col("qv"), F.col("nv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        probed.join(corpus, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cos_sim"), "rnk")
    )


def hard_negatives(embeddings: DataFrame, query_pred, k: int = 3) -> DataFrame:
    """Hard-negative mining (metric-learning data prep): for each anchor
    vector, the top-k most-similar vectors with a DIFFERENT label —
    the negatives that sit closest to the decision boundary and teach a
    contrastive model the most. Candidate generation is the banded
    sign-LSH equi-join (the q30 geometry), so only bucket-colliding
    high-similarity vectors are ever scored — which is exactly the set
    hard-negative mining wants; easy negatives never leave their
    buckets, and no anchor x corpus pass exists.

    Output: (query_id, query_label, neighbor_id, neighbor_label,
    cos_sim, rnk), deterministic under near-ties via the neighbor-id
    tiebreak."""
    emb = embeddings.select("vec_id", "label", _as_double("embedding").alias("v"))
    bucketed = emb.select(
        "vec_id",
        "label",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        _band_value_spark(F.col("v"), j).alias("bv"),
                    )
                    for j in range(ANN_BANDS)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "label", "v", "b.band", "b.bv")
    qb = bucketed.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("v").alias("qv"),
        "band",
        "bv",
    )
    nb = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("v").alias("nv"),
        "band",
        "bv",
    )
    sim = V.cosine(F.col("qv"), F.col("nv"))
    cand = (
        qb.join(nb, ["band", "bv"])
        .filter(
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("query_label") != F.col("neighbor_label"))
        )
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            sim.alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            F.round("sim", 6).alias("cos_sim"), "rnk",
        )
    )


def hard_negatives_sql(query_pred_sql: str, k: int = 3) -> str:
    """DuckDB twin of :func:`hard_negatives` (same hyperplane literals,
    same candidate geometry, same tiebreaks)."""
    cos = V.cosine_sql("qv", "nv")
    band_selects = "\n      UNION ALL ".join(
        f"SELECT vec_id, label, v, {j} AS band, {_band_value_sql('v', j)} AS bv FROM emb"
        for j in range(ANN_BANDS)
    )
    return f"""
    WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    bucketed AS ({band_selects}),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, q.label AS query_label,
             b.vec_id AS neighbor_id, b.label AS neighbor_label,
             q.v AS qv, b.v AS nv
      FROM bucketed q JOIN bucketed b ON q.band = b.band AND q.bv = b.bv
        AND q.vec_id <> b.vec_id AND q.label <> b.label
      WHERE {query_pred_sql.replace('vec_id', 'q.vec_id')}
    ),
    scored AS (
      SELECT query_id, query_label, neighbor_id, neighbor_label, {cos} AS sim
      FROM cand
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label,
           round(sim, 6) AS cos_sim, rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rnk
      FROM scored)
    WHERE rnk <= {k}
    """
