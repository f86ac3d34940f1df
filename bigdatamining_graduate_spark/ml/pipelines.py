"""MLlib pipeline wrappers — the §2.11 capability contract (M1-M14).

Every estimator call in the reference is reproduced here with three fixes:

1. **Everything is seeded.** The reference leaves ``randomSplit``, ``sample``,
   ``MinHashLSH`` and ``ALS`` unseeded (``hw4/hw4.py:169``,
   ``hw3/hw3.py:125,165``) so its own outputs are irreproducible.
2. **No driver-side learners.** The FinalProject clusters with sklearn on a
   ``toPandas()`` dump (``FinalProject/BDM_Final.py:533-563``); here KMeans/
   PCA/IDF run distributed in MLlib (M14).
3. **No collected vocabularies.** hw3 builds its characteristic matrix from
   a driver-side dict (``hw3/hw3.py:84-90``); ``CountVectorizer(binary=True)``
   produces the same one-hot rows as sparse vectors (D8).

The engine's job ends at the feature matrix / recommendation table — the
PyTorch classifiers (M15, ``FinalProject/BDM_Final.py:692-926``) sit beyond
the ``toPandas``/Arrow export boundary by design.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    MinHashLSH,
    MinMaxScaler,
    PCA,
    Tokenizer,
    VectorAssembler,
)
from pyspark.ml.functions import array_to_vector
from pyspark.ml.recommendation import ALS
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42


def build_ratings(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Implicit ratings (user=customer, item=part, rating=total quantity)
    from the star schema — the MovieLens triple of hw4 (``hw4/hw4.py:35-45``)
    derived distributively instead of via collect+createDataFrame (S8)."""
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.sum("l_quantity").cast("float").alias("rating"))
    )


def als_recommendations(
    orders: DataFrame,
    lineitem: DataFrame,
    k: int = 5,
    with_rmse: bool = False,
):
    """Seeded ALS + top-k recommendations (M8-M11, ``hw4/hw4.py:169-194``:
    maxIter=5, regParam=0.01, coldStartStrategy='drop', 80/20 split)."""
    ratings = build_ratings(orders, lineitem)
    train, test = ratings.randomSplit([0.8, 0.2], seed=SEED)
    als = ALS(
        maxIter=5,
        regParam=0.01,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
        seed=SEED,
    )
    model = als.fit(train)
    recs = (
        model.recommendForAllUsers(k)
        .select("user", F.explode("recommendations").alias("rec"))
        .select(
            F.col("user").cast("long").alias("user_id"),
            F.col("rec.item").cast("long").alias("item_id"),
            F.col("rec.rating").cast("double").alias("score"),
        )
    )
    if not with_rmse:
        return recs
    pred = model.transform(test)
    rmse = RegressionEvaluator(
        metricName="rmse", labelCol="rating", predictionCol="prediction"
    ).evaluate(pred)
    return recs, rmse


def als_recommendation_surfaces(
    orders: DataFrame,
    lineitem: DataFrame,
    k: int = 5,
    n_subset: int = 25,
) -> DataFrame:
    """All four ALS recommendation surfaces (M11, ``hw4/hw4.py:185-194``):
    ``recommendForAllUsers`` / ``recommendForAllItems`` /
    ``recommendForUserSubset`` / ``recommendForItemSubset``, normalized to
    one long table (surface, subject_id, rec_id, rank, score).

    ``subject_id`` is the entity recommendations are FOR (user on the
    user surfaces, item on the item surfaces); ``rec_id`` is the
    recommended entity; ``rank`` is the 1-based position inside the
    subject's top-k (descending score — materialized explicitly with
    ``posexplode`` so the contract is testable without relying on MLlib's
    array order being stable across versions).

    The reference picks its subsets with ``distinct().limit(3)``
    (``hw4/hw4.py:190,193``) — a nondeterministic row sample; here the
    subsets are the ``n_subset`` SMALLEST user/item ids (orderBy + limit),
    so the output is a pure function of the data and the seed.

    Scale: the all-pairs score matrix never materializes —
    ``recommendForAll*`` does the blocked cross-product with per-block
    top-k pruning JVM-side (the MLlib ``blockify`` path); the subset
    variants broadcast-filter the factor matrices first. The small
    subset DataFrames stay distributed end-to-end.
    """
    ratings = build_ratings(orders, lineitem)
    train, _ = ratings.randomSplit([0.8, 0.2], seed=SEED)
    als = ALS(
        maxIter=5,
        regParam=0.01,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
        seed=SEED,
    )
    model = als.fit(train)
    users = ratings.select("user").distinct().orderBy("user").limit(n_subset)
    items = ratings.select("item").distinct().orderBy("item").limit(n_subset)

    def _normalize(recs: DataFrame, subject: str, rec: str, surface: str) -> DataFrame:
        return recs.select(
            F.col(subject).cast("long").alias("subject_id"),
            F.posexplode("recommendations").alias("pos", "r"),
        ).select(
            F.lit(surface).alias("surface"),
            "subject_id",
            F.col(f"r.{rec}").cast("long").alias("rec_id"),
            (F.col("pos") + 1).cast("int").alias("rank"),
            F.col("r.rating").cast("double").alias("score"),
        )

    return (
        _normalize(model.recommendForAllUsers(k), "user", "item", "all_users")
        .unionByName(
            _normalize(model.recommendForAllItems(k), "item", "user", "all_items")
        )
        .unionByName(
            _normalize(
                model.recommendForUserSubset(users, k), "user", "item", "user_subset"
            )
        )
        .unionByName(
            _normalize(
                model.recommendForItemSubset(items, k), "item", "user", "item_subset"
            )
        )
    )


def kmeans_cluster_sizes(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """Distributed KMeans over the embedding column (M14): replaces the
    sklearn KMeans on a collected matrix (``FinalProject/BDM_Final.py:536-545``).
    ``array_to_vector`` (M-lib built-in) replaces the dense-vector UDF (D9,
    ``hw3/hw3.py:116-119``)."""
    feats = embeddings.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=SEED, featuresCol="features").fit(feats)
    return (
        model.transform(feats)
        .groupBy(F.col("prediction").cast("long").alias("cluster"))
        .agg(F.count("*").alias("size"))
    )


def pca_variance(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """Distributed PCA (M14): explained-variance vector of the top-k
    components as rows (component, variance)."""
    feats = embeddings.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = PCA(k=k, inputCol="features", outputCol="pc").fit(feats)
    spark = embeddings.sparkSession
    values = [(i, float(v)) for i, v in enumerate(model.explainedVariance)]
    return spark.createDataFrame(values, ["component", "variance"])


def tfidf_pipeline(docs: DataFrame, vocab_size: int = 1000, min_df: int = 5) -> DataFrame:
    """Tokenizer → CountVectorizer(vocabSize, minDF) → IDF (M1/M2/M7:
    ``FinalProject/BDM_Final.py:663-686``), fit+transform distributed;
    returns (doc_id, tfidf vector) — the feature matrix at the engine's
    export boundary (M15)."""
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="words"),
            CountVectorizer(
                inputCol="words", outputCol="tf", vocabSize=vocab_size, minDF=float(min_df)
            ),
            IDF(inputCol="tf", outputCol="tfidf"),
        ]
    )
    model = pipe.fit(docs)
    return model.transform(docs).select("doc_id", "tfidf")


def mllib_minhash_pairs(
    docs: DataFrame, threshold: float = 0.5, max_docs: int = 2000
) -> DataFrame:
    """The hw3 MinHashLSH path through MLlib itself (M5/J5):
    Tokenizer → binary CountVectorizer (sparse one-hot characteristic
    matrix, D8) → seeded MinHashLSH → ``approxSimilarityJoin`` — the
    primitive the reference hand-rolled with explode+groupBy
    (``hw3/hw3.py:125-172``).

    ``max_docs`` mirrors the reference's own ``limit(2000)`` cap
    (``hw3/hw3.py:159``), made DETERMINISTIC via an orderBy: on a
    token-set-dense corpus approxSimilarityJoin's bucket join fans out
    near-quadratically (observed: JVM OOM at 5000 fixture docs). The
    scale path for unbounded corpora is ``operators.dedup`` (bounded
    banding + df caps), not this MLlib parity route."""
    docs = docs.orderBy("doc_id").limit(max_docs)
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="words"),
            CountVectorizer(inputCol="words", outputCol="features", binary=True),
        ]
    )
    feats = pipe.fit(docs).transform(docs).select("doc_id", "features")
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=10, seed=SEED
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 1.0 - threshold, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )


def scaled_feature_matrix(customer: DataFrame) -> DataFrame:
    """VectorAssembler + MinMaxScaler (M3/M4, ``hw4/hw4.py:93-99``) over
    numeric customer features — returns (c_custkey, scaled vector)."""
    assembled = VectorAssembler(
        inputCols=["c_acctbal", "c_nationkey"], outputCol="raw"
    ).transform(customer.na.fill(0.0, ["c_acctbal"]))
    model = MinMaxScaler(inputCol="raw", outputCol="scaled").fit(assembled)
    return model.transform(assembled).select("c_custkey", "scaled")


def brand_baskets(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Market baskets for frequent-itemset mining: one basket per order,
    items = the DISTINCT part brands in it (FPGrowth requires unique items
    per transaction). The brand dimension join broadcasts (part ≪ fact);
    the single shuffle is the per-order collect_set."""
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.collect_set("p_brand").alias("items"))
    )


def frequent_itemsets(
    lineitem: DataFrame,
    part: DataFrame,
    min_support: float = 0.02,
    max_size: int = 2,
) -> DataFrame:
    """FPGrowth frequent itemsets over order→brand baskets — the classic
    association-mining operator of a "big data mining" engine (extension:
    the reference's mining surface stops at LSH/ALS/clustering, SURVEY.md
    §2.11). Output restricted to itemsets of size ≤ ``max_size`` with the
    items sorted and joined, so the result is fully SQL-oracle-checkable
    (freq(singleton)/freq(pair) are plain group-bys; MLlib's threshold is
    ``ceil(min_support * n_baskets)``).

    Scale: FPGrowth is the distributed counterpart of the a-priori loop —
    one pass counts singletons, conditional FP-trees shuffle by suffix
    item; with a bounded item vocabulary (brands) tree depth ≈ basket
    size, so memory stays flat as baskets scale 1000×."""
    from pyspark.ml.fpm import FPGrowth

    # FP-growth is a TWO-pass algorithm (singleton counts, then
    # conditional trees) — without a cache the basket join+collect_set
    # recomputes per pass (measured ~25% of the query at sf0.1; on a
    # cluster this is a persist-to-memory-and-disk on the basket table)
    baskets = brand_baskets(lineitem, part).cache()
    model = FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=0.1
    ).fit(baskets)
    baskets.unpersist()
    return (
        model.freqItemsets.filter(F.size("items") <= max_size)
        .select(
            F.concat_ws(",", F.array_sort("items")).alias("items_str"),
            F.col("freq").cast("bigint").alias("freq"),
        )
    )


def frequent_itemsets_sql(min_support: float = 0.02) -> str:
    """DuckDB oracle for ``frequent_itemsets`` (size ≤ 2)."""
    return f"""
    WITH basket_items AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM basket_items),
    minc AS (SELECT cast(ceil({min_support} * n_baskets) as bigint) AS m FROM n),
    s1 AS (SELECT p_brand AS items_str, count(*) AS freq FROM basket_items GROUP BY 1),
    s2 AS (SELECT a.p_brand || ',' || b.p_brand AS items_str, count(*) AS freq
           FROM basket_items a
           JOIN basket_items b
             ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
           GROUP BY 1)
    SELECT items_str, cast(freq as bigint) AS freq FROM s1, minc WHERE freq >= m
    UNION ALL
    SELECT items_str, cast(freq as bigint) AS freq FROM s2, minc WHERE freq >= m
    """


def association_rules(
    lineitem: DataFrame,
    part: DataFrame,
    min_support: float = 0.02,
    min_confidence: float = 0.3,
) -> DataFrame:
    """FPGrowth association rules restricted to 1→1 (antecedent and
    consequent both single items), which keeps every output column —
    confidence = freq(ab)/freq(a), lift = confidence/(freq(b)/n),
    support = freq(ab)/n — exactly reproducible in SQL (the arithmetic is
    plain IEEE double division of two counts, bit-identical across
    engines)."""
    from pyspark.ml.fpm import FPGrowth

    baskets = brand_baskets(lineitem, part).cache()  # two-pass fit, see above
    model = FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=min_confidence
    ).fit(baskets)
    baskets.unpersist()
    return (
        model.associationRules.filter(
            (F.size("antecedent") == 1) & (F.size("consequent") == 1)
        )
        .select(
            F.element_at("antecedent", 1).alias("antecedent"),
            F.element_at("consequent", 1).alias("consequent"),
            "confidence",
            "lift",
            "support",
        )
    )


def association_rules_sql(min_support: float = 0.02, min_confidence: float = 0.3) -> str:
    """DuckDB oracle for ``association_rules`` (1→1 rules)."""
    return f"""
    WITH basket_items AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM basket_items),
    minc AS (SELECT cast(ceil({min_support} * n_baskets) as bigint) AS m FROM n),
    s1 AS (SELECT p_brand, count(*) AS freq FROM basket_items GROUP BY 1),
    s2 AS (SELECT a.p_brand AS ba, b.p_brand AS bb, count(*) AS freq
           FROM basket_items a
           JOIN basket_items b
             ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
           GROUP BY 1, 2),
    freq_pairs AS (
      -- both orientations of each frequent pair (rule a→b and b→a)
      SELECT ba AS a, bb AS b, freq FROM s2, minc WHERE freq >= m
      UNION ALL
      SELECT bb AS a, ba AS b, freq FROM s2, minc WHERE freq >= m
    )
    SELECT p.a AS antecedent, p.b AS consequent,
           cast(p.freq as double) / fa.freq AS confidence,
           (cast(p.freq as double) / fa.freq) / (cast(fb.freq as double) / n.n_baskets) AS lift,
           cast(p.freq as double) / n.n_baskets AS support
    FROM freq_pairs p
    JOIN s1 fa ON fa.p_brand = p.a
    JOIN s1 fb ON fb.p_brand = p.b
    CROSS JOIN n CROSS JOIN minc
    WHERE fa.freq >= minc.m
      AND cast(p.freq as double) / fa.freq >= {min_confidence}
    """


def lang_classifier_eval(docs: DataFrame) -> DataFrame:
    """Distributed multinomial logistic regression classifying a document's
    ``lang`` from its token counts — the Spark-native closing of the
    FinalProject classification loop (M15): the reference exports features
    to driver-side PyTorch (``FinalProject/BDM_Final.py:692-926``); here
    the whole train→predict→evaluate path stays distributed. Deterministic
    hash split (80/20 by doc_id), seeded LR; returns per-language test
    counts and accuracy (the reference's own acceptance metric shape —
    BASELINE.md CNN/LSTM accuracy rows).

    Fixture caveat: the synthetic documents share one vocabulary across
    languages, so token counts carry near-chance language signal (the
    char-trigram heuristic in ``operators/langid.py`` confuses the same
    pairs). Class-balanced weights keep the fit honest (≈chance on every
    class) instead of collapsing to the majority class; on a real corpus
    the same pipeline learns the separable signal."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StringIndexer

    base = docs.select("doc_id", F.lower(F.col("text")).alias("text"), "lang").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    train = base.filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) < 4)
    test = base.filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 4)
    # class-balanced sample weights: the corpus is majority-English, and an
    # unweighted fit degenerates to the majority class on minority langs
    counts = train.groupBy("lang").agg(F.count("*").alias("n_lang"))
    n_train = train.count()
    n_class = counts.count()
    train = train.join(F.broadcast(counts), "lang").withColumn(
        "weight", F.lit(float(n_train)) / (F.lit(float(n_class)) * F.col("n_lang"))
    )
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="words"),
            CountVectorizer(inputCol="words", outputCol="features", vocabSize=2000, minDF=2.0),
            StringIndexer(inputCol="lang", outputCol="label", handleInvalid="keep"),
            LogisticRegression(
                maxIter=50, regParam=0.001, family="multinomial", weightCol="weight"
            ),
        ]
    )
    model = pipe.fit(train)
    pred = model.transform(test)
    return (
        pred.groupBy("lang")
        .agg(
            F.count("*").alias("n_test"),
            F.sum((F.col("label") == F.col("prediction")).cast("int"))
            .cast("bigint")
            .alias("n_correct"),
        )
        .withColumn("accuracy", F.round(F.col("n_correct") / F.col("n_test"), 4))
    )
