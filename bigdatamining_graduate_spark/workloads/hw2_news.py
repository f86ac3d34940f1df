"""hw2 parity: News Popularity word frequency + time-series rollups.

Reference: ``hw2/BDM_hw2_final.py``. The two scale blockers fixed here:

* word counting dropped to RDD ``flatMap`` (A6, ``:64-67``) → explode +
  hash agg;
* the hourly/daily rollups ran a DRIVER LOOP of 48 (resp. 2) full-outer
  self-joins accumulating one column per pass (J2, ``:149-180``) plus a
  pandas round-trip for the sum/avg recombination (``:203-207``) — here a
  SINGLE select computes all 48 hourly means / both daily means at once,
  and sum+avg aggregate in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as TX
from ..sources.readers import read_delimited

TOPICS = ("economy", "microsoft", "obama", "palestine")

NEWS_SCHEMA = T.StructType(
    [
        T.StructField("IDLink", T.DoubleType()),
        T.StructField("Title", T.StringType()),
        T.StructField("Headline", T.StringType()),
        T.StructField("Source", T.StringType()),
        T.StructField("Topic", T.StringType()),
        T.StructField("PublishDate", T.StringType()),
        T.StructField("SentimentTitle", T.DoubleType()),
        T.StructField("SentimentHeadline", T.DoubleType()),
    ]
)


def ts_schema(n_slots: int = 144) -> T.StructType:
    """Platform time-series files: IDLink + TS1..TS144 (FIXTURES.md §1.2),
    explicit schema replacing inferSchema (S5)."""
    fields = [T.StructField("IDLink", T.DoubleType())]
    fields += [T.StructField(f"TS{i}", T.DoubleType()) for i in range(1, n_slots + 1)]
    return T.StructType(fields)


def load_news(spark: SparkSession, path: str) -> DataFrame:
    df = read_delimited(spark, path, NEWS_SCHEMA, sep=",", header=True, escape='"')
    return df.na.fill("missing", ["Title", "Headline", "Source"])


def load_platform(spark: SparkSession, glob_path: str) -> DataFrame:
    """Glob scan over ``{platform}_*.csv`` (S6) — one multi-file read."""
    return read_delimited(spark, glob_path, ts_schema(), sep=",", header=True)


def word_freq_by_topic(news: DataFrame, top_k: int = 100) -> DataFrame:
    """Top-k title words PER topic (A6/A7, ``:87-96``), UDF-free.

    Per-topic ranking via row_number — a global sort+limit would return
    rows only from the alphabetically-first topic once any topic has more
    than top_k distinct words."""
    from pyspark.sql import Window

    words = (
        news.filter(F.col("Topic").isin(*TOPICS))
        .select("Topic", F.explode(TX.tokenize("Title")).alias("word"))
    )
    w = Window.partitionBy("Topic").orderBy(F.desc("count"), F.asc("word"))
    return (
        words.groupBy("Topic", "word")
        .agg(F.count("*").alias("count"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .drop("rn")
    )


def sentiment_by_topic(news: DataFrame) -> DataFrame:
    """Sentiment sum AND avg in one pass (A9; the reference runs two jobs
    then merges in pandas, ``:203-209``)."""
    return news.groupBy("Topic").agg(
        F.sum("SentimentTitle").alias("title_sum"),
        F.avg("SentimentTitle").alias("title_avg"),
        F.sum("SentimentHeadline").alias("headline_sum"),
        F.avg("SentimentHeadline").alias("headline_avg"),
    )


def hourly_rollup(platform: DataFrame, n_slots: int = 144) -> DataFrame:
    """48 hourly means (3 20-min slots each) in ONE projection —
    replaces 48 iterative outer self-joins (``:149-163``)."""
    exprs = [
        ((F.col(f"TS{3 * h + 1}") + F.col(f"TS{3 * h + 2}") + F.col(f"TS{3 * h + 3}")) / 3).alias(
            f"hour{h + 1}"
        )
        for h in range(n_slots // 3)
    ]
    return platform.select("IDLink", *exprs)


def daily_rollup(platform: DataFrame, n_slots: int = 144) -> DataFrame:
    """Two daily means (72 slots each) — golden-output schema
    ``IDLink, day1, day2`` (``hw2/Facebook_popular_day.csv``)."""
    half = n_slots // 2
    day1 = sum(F.col(f"TS{i}") for i in range(1, half + 1)) / half
    day2 = sum(F.col(f"TS{i}") for i in range(half + 1, n_slots + 1)) / half
    return platform.select("IDLink", day1.alias("day1"), day2.alias("day2"))


def title_cooccurrence(news: DataFrame, top_vocab: int = 100) -> DataFrame:
    """Word co-occurrence within titles restricted to the top-k vocabulary
    (D2 + A13, ``:224-245``): vocabulary is a broadcast semi-join, not a
    collected Python list baked into a UDF; output is long-form counts
    (scalable) rather than a driver-wide crosstab."""
    # IDLink is the stable per-row key — monotonically_increasing_id would
    # be re-evaluated independently on both sides of the self-join and can
    # diverge across task retries / AQE re-planning
    words = news.select(
        F.col("IDLink").alias("row_id"),
        F.explode(F.array_distinct(TX.tokenize("Title"))).alias("word"),
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(top_vocab)
        .select("word")
    )
    kept = words.join(F.broadcast(vocab), "word")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(b, "row_id")
        .filter(F.col("a.word") < F.col("b.word"))
        .groupBy(F.col("a.word").alias("w1"), F.col("b.word").alias("w2"))
        .agg(F.count("*").alias("n_titles"))
    )


def to_ts_array(platform: DataFrame, n_slots: int = 144) -> DataFrame:
    """Wide TS1..TS144 → single ``array<double>`` column (the SURVEY §1.4
    design mapping): at 100 TB a 144-wide row of scalar columns bloats
    the Catalyst schema and every projection; one array column keeps the
    scan narrow and rollups become array expressions."""
    return platform.select(
        "IDLink", F.array(*[F.col(f"TS{i}") for i in range(1, n_slots + 1)]).alias("ts")
    )


def hourly_rollup_from_array(ts_df: DataFrame) -> DataFrame:
    """Hourly means over the array layout: slice + aggregate per hour —
    same results as :func:`hourly_rollup`, array-native plan."""
    n_hours = 48
    exprs = [
        (
            F.aggregate(
                F.slice("ts", 3 * h + 1, 3), F.lit(0.0), lambda acc, x: acc + x
            )
            / 3.0
        ).alias(f"hour{h + 1}")
        for h in range(n_hours)
    ]
    return ts_df.select("IDLink", *exprs)
