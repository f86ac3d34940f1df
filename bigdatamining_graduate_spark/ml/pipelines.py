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
