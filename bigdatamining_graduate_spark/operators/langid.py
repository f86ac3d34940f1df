"""Character-n-gram language identification — the training-data-pipeline
language-ID layer.

The reference never identifies language (its corpora are monolingual), but
a corpus-curation pipeline at scale needs it; this is the classical
n-gram-profile method (Cavnar & Trenkle 1994, "N-Gram-Based Text
Categorization") re-expressed as three Catalyst plans:

1. **Profile build** (training): per-language document frequency of
   distinct character trigrams over the deterministic hash-train split
   (same 8/10 split function as ``plans.queries.q64_hash_split_profile``),
   keeping the top ``PROFILE_K`` grams per language. One (lang, gram)
   hash-aggregate — partial aggregation collapses each map partition to
   its distinct (lang, gram) set, so the shuffle is bounded by trigram
   vocabulary, not corpus size — then a window rank over the tiny
   aggregated relation.
2. **Scoring**: each document's distinct trigrams are equi-joined against
   the profile (≤ |langs| × PROFILE_K rows → always a broadcast-hash
   join; map-side, no shuffle), hits counted per (doc, candidate lang).
3. **Argmax**: ``row_number`` over (hits desc, lang asc) per document —
   deterministic tie-break; ≤ |langs| rows per key, so the window is
   skew-free by construction. Unmatched documents classify as ``'unk'``
   via a left join from the corpus.

All expressions are built-ins (whole-stage codegen); the DuckDB twins are
generated from the same constants so Spark and oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.hashing import portable_hash64, portable_hash64_sql

TRIGRAM_N = 3
PROFILE_K = 40          # grams kept per language profile
SPLIT_BUCKETS = 10      # same deterministic split as q64_hash_split_profile
SPLIT_TRAIN = 8         # buckets 0-7 -> train
SPLIT_SALT = "split"


def char_trigrams(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang, gram) rows: DISTINCT character trigrams of the
    normalized text. The normalized string is PROJECTED FIRST so the
    higher-order ``transform`` indexes a materialized attribute instead
    of re-evaluating the regex-normalize chain per position (the
    projection-boundary rule from ``dedup.doc_grams``)."""
    nt = docs.select(F.col(id_col), F.col("lang"), TX.normalize_text(text_col).alias("nt"))
    idx = F.sequence(F.lit(1), F.length("nt") - (TRIGRAM_N - 1))
    grams = F.when(
        F.length("nt") >= TRIGRAM_N,
        F.transform(idx, lambda i: F.col("nt").substr(i, F.lit(TRIGRAM_N))),
    ).otherwise(F.array().cast("array<string>"))
    return nt.select(F.col(id_col), F.col("lang"), F.explode(F.array_distinct(grams)).alias("gram"))


def _char_trigrams_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`char_trigrams` (a full SELECT)."""
    nt = TX.normalize_text_sql("text")
    grams = (
        f"CASE WHEN len(nt) >= {TRIGRAM_N} THEN "
        f"list_transform(generate_series(1, len(nt) - {TRIGRAM_N - 1}),"
        f" i -> substr(nt, cast(i as int), {TRIGRAM_N}))"
        f" ELSE [] END"
    )
    return (
        f"SELECT doc_id, lang, unnest(list_distinct({grams})) AS gram "
        f"FROM (SELECT doc_id, lang, {nt} AS nt FROM {table})"
    )


def _is_train(id_col: str = "doc_id"):
    return portable_hash64(F.col(id_col).cast("string"), SPLIT_SALT) % SPLIT_BUCKETS < SPLIT_TRAIN


def _is_train_sql(id_expr: str = "doc_id") -> str:
    h = portable_hash64_sql(f"cast({id_expr} as varchar)", SPLIT_SALT)
    return f"{h} % {SPLIT_BUCKETS} < {SPLIT_TRAIN}"


def lang_profiles(docs: DataFrame) -> DataFrame:
    """(cand_lang, gram): top-``PROFILE_K`` trigrams per language by
    train-split document frequency (ties broken by gram asc)."""
    g = char_trigrams(docs.filter(_is_train()))
    df_counts = g.groupBy("lang", "gram").agg(F.count("*").alias("df"))
    w = Window.partitionBy("lang").orderBy(F.desc("df"), F.asc("gram"))
    return (
        df_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PROFILE_K)
        .select(F.col("lang").alias("cand_lang"), "gram")
    )


def langid_confusion(docs: DataFrame) -> DataFrame:
    """Confusion matrix (lang, pred_lang, n_docs) of n-gram-profile
    language ID against the labeled ``lang`` column, over ALL documents
    (train docs included — the matrix is a data-quality report, not a
    held-out evaluation; the split only controls what the profiles see)."""
    prof = lang_profiles(docs)
    g = char_trigrams(docs)
    hits = (
        g.join(F.broadcast(prof), "gram")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count("*").alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("cand_lang"))
    pred = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"))
    )
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id", "left")
        .groupBy("lang", F.coalesce("pred_lang", F.lit("unk")).alias("pred_lang"))
        .agg(F.count("*").alias("n_docs"))
    )


def langid_confusion_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`langid_confusion`."""
    return f"""
    WITH g AS ({_char_trigrams_sql(table)}),
    dfc AS (
      SELECT lang, gram, count(*) AS df
      FROM g WHERE {_is_train_sql()}
      GROUP BY lang, gram
    ),
    prof AS (
      SELECT lang AS cand_lang, gram FROM (
        SELECT lang, gram,
               row_number() OVER (PARTITION BY lang ORDER BY df DESC, gram) AS rn
        FROM dfc
      ) WHERE rn <= {PROFILE_K}
    ),
    hits AS (
      SELECT g.doc_id, prof.cand_lang, count(*) AS hits
      FROM g JOIN prof USING (gram)
      GROUP BY g.doc_id, prof.cand_lang
    ),
    pred AS (
      SELECT doc_id, cand_lang AS pred_lang FROM (
        SELECT doc_id, cand_lang,
               row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rn
        FROM hits
      ) WHERE rn = 1
    )
    SELECT d.lang, coalesce(p.pred_lang, 'unk') AS pred_lang, count(*) AS n_docs
    FROM {table} d LEFT JOIN pred p USING (doc_id)
    GROUP BY d.lang, coalesce(p.pred_lang, 'unk')
    """
