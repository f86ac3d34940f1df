"""hw3 parity: Reuters-21578 SGML parsing + near-duplicate detection.

Reference: ``hw3/hw3.py``. Fixed here:

* per-file union loop over a seed DataFrame (S10/U1, ``:23-31``) → one
  whole-file scan + explode;
* six scalar-UDF regex steps (D3-D7, ``:41-66``) → built-in
  ``regexp_extract``/``regexp_replace``/``split``/``size``;
* driver-collected vocabulary + dense one-hot rows (D8, ``:84-90``) →
  the engine's sketch operators (``operators.dedup``) or MLlib
  ``CountVectorizer(binary=True)`` (``ml.pipelines.mllib_minhash_pairs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..sources.readers import read_whole_files

MIN_TOKENS = 8


def parse_articles(spark: SparkSession, glob_path: str) -> DataFrame:
    """*.sgm files → (article_id, body) rows.

    Whole-file read → split on ``</REUTERS>`` → explode (one row per
    article, executor-side; the reference loops files on the driver) →
    regex-extract OLDID + <BODY>, lowercase, letters-only, then drop
    articles without a BODY tag or with < 8 tokens (cardinality
    invariants: 21,578 → −2,535 → −24, ``hw3/hw3.py:36,44,64``)."""
    files = read_whole_files(spark, glob_path)
    articles = files.select(
        F.explode(F.split("content", "</REUTERS>")).alias("article")
    ).filter(F.col("article").contains("<BODY>"))
    extracted = articles.select(
        F.regexp_extract("article", 'OLDID="(.*?)"', 1).alias("article_id"),
        F.lower(F.regexp_extract("article", "(?s)<BODY>(.*?)</BODY>", 1)).alias("raw_body"),
    )
    body = F.trim(
        F.regexp_replace(F.regexp_replace("raw_body", "[^a-z ]", " "), " +", " ")
    )
    cleaned = extracted.select("article_id", body.alias("body"))
    return cleaned.filter(F.size(F.split("body", " ")) >= MIN_TOKENS)


def near_duplicates(articles: DataFrame, threshold: float = 0.5) -> DataFrame:
    """MinHash+LSH candidate pairs over article bodies — the engine's
    sketch path (no collected vocab, no dense characteristic matrix)."""
    docs = articles.select(
        F.col("article_id").cast("long").alias("doc_id"), F.col("body").alias("text")
    )
    sig = DD.minhash_signatures(docs)
    return DD.lsh_candidate_pairs(sig, threshold)
