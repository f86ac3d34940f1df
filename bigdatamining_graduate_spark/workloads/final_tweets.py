"""FinalProject parity: COVID-19 tweet EDA + sentiment label pipeline.

Reference: ``FinalProject/BDM_Final.py``. Fixed here:

* per-file read + union loop (S7, ``:75-81``) → one multi-path scan;
* 29-line scalar ``preprocess_text`` UDF with broadcast stopword list
  (D12, ``:92-124``) → the engine's built-in text chain;
* top-5-per-(year,month) via ``rank`` kept EXACTLY (ties included, W2);
* sentiment relabeling: numeric-string rows remapped by threshold then
  re-attached with unionByName (J6/U2/P14, ``:607-624``), labels mapped
  {pos→2, neu→1, neg→0} (``:639-651``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as TX
from ..sources.readers import read_delimited

TWEETS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("original_text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("favorite_count", T.StringType()),
        T.StructField("retweet_count", T.StringType()),
        T.StructField("original_author", T.StringType()),
        T.StructField("hashtags", T.StringType()),
        T.StructField("user_mentions", T.StringType()),
        T.StructField("place", T.StringType()),
        T.StructField("clean_tweet", T.StringType()),
        T.StructField("compound", T.DoubleType()),
        T.StructField("sentiment", T.StringType()),
    ]
)


def load(spark: SparkSession, paths: list[str]) -> DataFrame:
    """All CSVs in ONE read (vs the union loop, S7) with date-validity
    filter (P11, ``:268``) and derived year/month (F6/F7, ``:271-272``)."""
    df = read_delimited(spark, paths, TWEETS_SCHEMA, sep=",", header=True, escape='"')
    df = df.filter(F.col("created_at").rlike(r"^\d{4}-\d{2}-\d{2}$"))
    d = F.to_date("created_at", "yyyy-MM-dd")
    return df.withColumn("year", F.year(d)).withColumn("month", F.month(d))


def top_tweets_by_favorites(df: DataFrame, n: int = 30) -> DataFrame:
    """Dirty-numeric filter + sort on cast key + bounded fetch (O3/O4,
    ``:216-226``): try_cast keeps non-numeric rows out without ANSI errors."""
    fav = F.col("favorite_count").try_cast("double")
    return (
        df.filter(fav.isNotNull() & (F.trim("original_text") != ""))
        .select("id", "original_text", fav.alias("favorites"))
        .orderBy(F.desc("favorites"), F.asc("id"))
        .limit(n)
    )


def _top5_per_month(exploded: DataFrame, col: str) -> DataFrame:
    counts = (
        exploded.filter(F.col(col).isNotNull() & (F.trim(col) != ""))
        .groupBy("year", "month", col)
        .agg(F.count("*").alias("count"))
    )
    w = Window.partitionBy("year", "month").orderBy(F.desc("count"))
    return counts.withColumn("rank", F.rank().over(w)).filter(F.col("rank") <= 5)


def top_words_per_month(df: DataFrame) -> DataFrame:
    """Clean → tokenize → stopword-filter → top-5 words per (year,month)
    via rank (W2, ``:303-311``) — the whole D12 UDF chain as built-ins."""
    words = df.select(
        "year", "month", F.explode(TX.remove_stopwords(TX.tokenize("original_text"))).alias("word")
    )
    return _top5_per_month(words, "word")


def top_hashtags_per_month(df: DataFrame) -> DataFrame:
    """Comma-list explode (F1/F2, ``:333``)."""
    tags = df.select(
        "year", "month", F.explode(F.split("hashtags", r",\s*")).alias("hashtag")
    )
    return _top5_per_month(tags, "hashtag")


def top_mentions_per_month(df: DataFrame) -> DataFrame:
    """Mentions with the numeric-only entries dropped (P11, ``:433``)."""
    mentions = df.select(
        "year", "month", F.explode(F.split("user_mentions", r",\s*")).alias("mention")
    ).filter(F.col("mention").rlike("[A-Za-z]"))
    return _top5_per_month(mentions, "mention")


def normalize_sentiment_labels(df: DataFrame) -> DataFrame:
    """The reference's two-step relabel (``:607-651``) in one pass:
    stray numeric sentiment strings (compound scores in [0,1]) map by
    threshold 0.5 → pos/neu; then {pos,neu,neg} → {2,1,0}. The reference
    does this with a distinct-scan, a left-anti join and a unionByName —
    semantics preserved, jobs collapsed (the when-chain is row-local)."""
    num = F.col("sentiment").try_cast("double")
    label = (
        F.when(num.isNotNull() & (num >= 0.5), "pos")
        .when(num.isNotNull(), "neu")
        .otherwise(F.col("sentiment"))
    )
    code = (
        F.when(label == "pos", 2)
        .when(label == "neu", 1)
        .when(label == "neg", 0)
        .otherwise(F.lit(None).cast("int"))
    )
    return df.withColumn("sentiment_label", code)


def sentiment_distribution(df: DataFrame) -> DataFrame:
    return (
        normalize_sentiment_labels(df)
        .groupBy("sentiment_label")
        .agg(F.count("*").alias("n"))
    )


def eda_summary(df: DataFrame) -> dict:
    """The FinalProject EDA re-runs ~15 queries against the same cleaned
    frame, recomputing it from source every time (no caching anywhere in
    the reference — SURVEY.md §4.1 last row). The engine's policy: CACHE
    the cleaned frame once, run every summary against it, unpersist.
    Returns {name: row_count} for the materialized summaries."""
    df = df.cache()
    try:
        out = {
            "top_tweets": top_tweets_by_favorites(df).count(),
            "top_words": top_words_per_month(df).count(),
            "top_hashtags": top_hashtags_per_month(df).count(),
            "top_mentions": top_mentions_per_month(df).count(),
            "sentiment": sentiment_distribution(df).count(),
        }
    finally:
        df.unpersist()
    return out
