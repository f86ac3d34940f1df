"""Incrementally maintained INVERTED INDEX (BM25 lexical retrieval).

q106 established BM25 as the engine's lexical-retrieval operator; this
module gives its index the same maintenance discipline the LSH
signature store (q227), the component label store (q228/q229), and the
IVF postings table (q233/q236) already have: a persisted index —
per-document length table ``dl(doc_id, dl)`` and per-term postings
``tf(doc_id, token, tf)`` — that refreshes under insert (q242), delete
(q243), upsert (q244), and streaming (q245, ``streaming/jobs.py``)
arrival WITHOUT re-tokenizing the corpus, with store vacuum pinned in
``tests/test_lexical_index.py`` — completing the engine's maintenance
matrix: three index families × five arrival shapes, every cell
oracle-proven against the full recompute.

The load-bearing design decision: the stores hold POSTINGS (per-doc
term counts — stable under corpus growth), never SCORES.  BM25 scores
depend on corpus-global statistics (N, avgdl, per-term df), every one
of which moves on EVERY insert or delete — so a cached score is stale
the moment the corpus changes, while a cached posting is exact forever
(a document's term counts never change unless the document does).
Maintenance therefore appends/tombstones postings in O(|batch| tokens)
and recomputes scores from the merged stores at query time, where the
fixed-term filter prunes the postings read to the query terms' lists.
``tests/test_semantics.py`` pins the corollary: after a deletion the
surviving documents' scores CHANGE (idf/avgdl shift), so a
carry-the-scores design would be provably wrong, not just slower.

Arrival slices reuse the corpus-wide conventions (``dedup`` salts
"ilsh" / "idel"): one crawl-batch event refreshes the LSH store, the
label store, AND the inverted index consistently.

Reference anchor: the reference ranks documents with TF-IDF built from
scratch per run (``FinalProject/BDM_Final.py``); extension — it has no
persisted index and no refresh path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoints import local_checkpoint
from ..functions import text as TX
from .dedup import _incr_deleted_flag, _incr_delta_flag

#: BM25 constants — shared with q106 (Robertson; Lucene idf variant)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20
BM25_TERMS = ("spark", "table", "query")


def _doc_tokens(docs: DataFrame) -> DataFrame:
    """The shared tokenized projection (doc_id, tokens) BOTH stores
    derive from — checkpointed by the callers so indexing a slice costs
    ONE documents scan, not one per store (the q63 single-scan
    discipline)."""
    return docs.select("doc_id", TX.tokenize("text").alias("tokens"))


def _dl_from_tokens(tok: DataFrame) -> DataFrame:
    """(doc_id, dl) off the tokenized projection.  Zero explode: token
    count is the array length.  Zero-token docs are excluded to match
    the explode-derived dl of the oracle (and q106): a doc with no
    tokens has no postings and contributes to neither n_docs nor
    avgdl."""
    return tok.select(
        "doc_id", F.size("tokens").cast("long").alias("dl")
    ).filter(F.col("dl") > 0)


def _tf_from_tokens(tok: DataFrame, terms=BM25_TERMS) -> DataFrame:
    """(doc_id, token, tf) for the query vocabulary, off the tokenized
    projection.  A full production index stores ALL tokens; restricting
    the build to ``terms`` keeps fixtures small without changing the
    plan shape — the explode+filter+groupBy is identical, the filter
    just prunes the exploded stream earlier."""
    ex = tok.select("doc_id", F.explode("tokens").alias("token"))
    return (
        ex.filter(F.col("token").isin(*terms))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def doc_lengths(docs: DataFrame) -> DataFrame:
    """dl store rows straight from documents (store-build entry point)."""
    return _dl_from_tokens(_doc_tokens(docs))


def term_postings(docs: DataFrame, terms=BM25_TERMS) -> DataFrame:
    """tf store rows straight from documents (store-build entry point)."""
    return _tf_from_tokens(_doc_tokens(docs), terms)


def _bm25_from_stores(dl: DataFrame, tf: DataFrame) -> DataFrame:
    """Score the fixed-term query from (possibly merged) stores — the
    q106 arithmetic verbatim, reading postings instead of raw text.
    Global stats (N, avgdl, df) derive from the CURRENT stores, never
    cached: they move on every refresh, postings don't."""
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count("*").alias("n_docs"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    part = idf * F.col("tf") * (BM25_K1 + 1.0) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", part.alias("part"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOP)
    )


def incremental_bm25(
    docs: DataFrame,
    dl_store: DataFrame | None = None,
    tf_store: DataFrame | None = None,
) -> DataFrame:
    """INSERT-side inverted-index maintenance (q242): the q227 arrival
    batch (20% hash slice, salt "ilsh" — the same crawl event that
    refreshes the LSH store) lands against a persisted dl/tf index.
    Only the batch is tokenized; base postings are read from the store
    verbatim (insert-only batches have disjoint doc_ids, so the merge
    is a pure union — no per-key reconciliation).  Scores then derive
    from the MERGED stores, so the corpus-global statistics every
    document's score depends on (N, avgdl, df) are exact for the new
    corpus — the reason the stores hold postings, not scores.

    The DuckDB oracle is the FULL BM25 recompute over store ∪ batch
    (q106's pipeline on the whole corpus), so the driver hash-match
    proves maintained-index search == full-rebuild search every round.

    ``dl_store`` / ``tf_store`` inject the persisted index (roundtrip
    test); defaults derive in-plan from the base slice.

    Scale: refresh is O(|batch| tokens); query-time work is the query
    terms' posting lists + one avgdl aggregate over the dl store (a
    per-doc stat table, materialized once per snapshot)."""
    delta = _incr_delta_flag()
    # one documents scan per slice: dl and tf derive from a shared
    # checkpointed token projection (the q63 single-scan discipline);
    # on the persisted-store path only the batch is ever tokenized
    batch_tok = local_checkpoint(
        _doc_tokens(docs.filter(delta)), eager=False
    )
    if dl_store is None or tf_store is None:
        base_tok = local_checkpoint(
            _doc_tokens(docs.filter(~delta)), eager=False
        )
    dl = (
        dl_store if dl_store is not None else _dl_from_tokens(base_tok)
    ).unionByName(_dl_from_tokens(batch_tok))
    tf = (
        tf_store if tf_store is not None else _tf_from_tokens(base_tok)
    ).unionByName(_tf_from_tokens(batch_tok))
    return _bm25_from_stores(dl, tf).select(
        "doc_id",
        "bm25",
        F.when(delta, F.lit("batch")).otherwise(F.lit("store")).alias("src"),
    )


def delete_aware_bm25(
    docs: DataFrame,
    dl_store: DataFrame | None = None,
    tf_store: DataFrame | None = None,
) -> DataFrame:
    """DELETE-side inverted-index maintenance (q243): the q229
    tombstone slice (10%, salt "idel") is erased.  Postings are
    tombstoned by one anti-filter per store (at scale: anti-joins
    against the tombstone set, or the q235/q239 vacuum on the
    compaction cadence) — nothing is re-tokenized.  But deletion moves
    EVERY survivor's score: N and avgdl shrink, df loses the deleted
    docs' contributions — so scores recompute from the shrunk stores
    while postings carry.  (Count stores are SUBTRACTABLE — unlike the
    HLL registers of q191, which can only grow; this is why the
    inverted index tombstones cleanly while distinct-count sketches
    need rebuild-on-delete.)

    The DuckDB oracle is the full BM25 recompute over the remaining
    corpus — the driver hash-match proves tombstoned-index search ==
    full-rebuild search.

    Scale: two anti-filters + the same query-time work as q242."""
    deleted = _incr_deleted_flag()
    if dl_store is None or tf_store is None:
        tok = local_checkpoint(_doc_tokens(docs), eager=False)
    dl = (
        dl_store if dl_store is not None else _dl_from_tokens(tok)
    ).filter(~deleted)
    tf = (
        tf_store if tf_store is not None else _tf_from_tokens(tok)
    ).filter(~deleted)
    return _bm25_from_stores(dl, tf)


def _bm25_sql(
    where: str, vocab: bool = False, table: str = "documents"
) -> str:
    """q106's oracle parameterized by a corpus predicate — the full
    recompute both maintenance identities are proven against.
    ``vocab=True`` adds the corpus-wide ``vocab_size`` audit column
    (the full-vocabulary proofs q251/q269 carry) and ``table``
    overrides the corpus relation (q244's revised-text subquery) — both
    parameters rather than post-hoc string surgery on the generated SQL
    (the q254 fragility class ADVICE r10 flagged)."""
    terms_sql = "(" + ", ".join(f"'{t}'" for t in BM25_TERMS) + ")"
    vocab_item = (
        ",\n           (SELECT count(DISTINCT token) FROM tok) AS vocab_size"
        if vocab
        else ""
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM {table} WHERE {where}
    ),
    tok AS (
      SELECT doc_id, unnest({TX.tokenize_sql('text')}) AS token FROM corpus
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM tok
      WHERE token IN {terms_sql} GROUP BY 1, 2
    ),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT t.doc_id,
             ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * t.tf * ({BM25_K1} + 1.0)
               / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                   + {BM25_B} * l.dl / s.avgdl)) AS part
      FROM tf t
      JOIN df d ON d.token = t.token
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
    )
    SELECT doc_id, round(sum(part), 6) AS bm25{vocab_item}
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC LIMIT {BM25_TOP}
    """


def incremental_bm25_sql() -> str:
    """Full recompute over the whole corpus (store ∪ batch) + the same
    store/batch provenance column."""
    from ..functions.hashing import portable_hash64_sql

    from .dedup import INCR_LSH_BUCKETS, INCR_LSH_HIST

    delta = (
        f"({portable_hash64_sql('cast(doc_id as varchar)', 'ilsh')}"
        f" % {INCR_LSH_BUCKETS}) >= {INCR_LSH_HIST}"
    )
    return (
        f"SELECT doc_id, bm25,"
        f" CASE WHEN {delta} THEN 'batch' ELSE 'store' END AS src"
        f" FROM ({_bm25_sql('TRUE')})"
    )


def delete_aware_bm25_sql() -> str:
    """Full recompute over the remaining corpus."""
    from ..functions.hashing import portable_hash64_sql

    from .dedup import INCR_DEL_BUCKETS

    deleted = (
        f"({portable_hash64_sql('cast(doc_id as varchar)', 'idel')}"
        f" % {INCR_DEL_BUCKETS}) = 0"
    )
    return _bm25_sql(f"NOT {deleted}")


def upsert_aware_bm25(
    docs: DataFrame,
    dl_store: DataFrame | None = None,
    tf_store: DataFrame | None = None,
) -> DataFrame:
    """UPSERT-side inverted-index maintenance (q244) — q231's
    content-change shape on the lexical index: the deterministic 10%
    revision slice (salt "iupd"; suffix sentence appended, the same t1
    corpus the LSH upsert family maintains against).  Every t0 posting
    touching a changed doc is dropped (stale — computed from content
    that no longer exists); only the changed docs' v2 text is
    re-tokenized; unchanged postings carry verbatim.  The revision's
    fine print makes this a sharp test: the suffix contains NO query
    term, so changed docs' tf postings are value-identical across
    snapshots — but their dl grows, avgdl moves, and every score in
    the corpus shifts.  A maintenance design that skipped "docs whose
    query-term counts didn't change" would be provably wrong; postings
    must refresh on ANY content change because dl is part of the
    posting.

    The DuckDB oracle is the full BM25 recompute over the t1 corpus.
    Output: top-20 (doc_id, bm25, src ∈ {carried, refreshed}).

    Scale: re-tokenizing is O(|changed|); the stale drop is one
    hash-slice anti-filter per store."""
    from .dedup import INCR_UPD_SUFFIX, _incr_updated_flag

    changed = _incr_updated_flag()
    t1_changed = docs.filter(changed).withColumn(
        "text", F.concat(F.col("text"), F.lit(INCR_UPD_SUFFIX))
    )
    chg_tok = local_checkpoint(_doc_tokens(t1_changed), eager=False)
    if dl_store is None or tf_store is None:
        base_tok = local_checkpoint(
            _doc_tokens(docs.filter(~changed)), eager=False
        )
    dl = (
        dl_store.filter(~changed)
        if dl_store is not None
        else _dl_from_tokens(base_tok)
    ).unionByName(_dl_from_tokens(chg_tok))
    tf = (
        tf_store.filter(~changed)
        if tf_store is not None
        else _tf_from_tokens(base_tok)
    ).unionByName(_tf_from_tokens(chg_tok))
    return _bm25_from_stores(dl, tf).select(
        "doc_id",
        "bm25",
        F.when(changed, F.lit("refreshed"))
        .otherwise(F.lit("carried"))
        .alias("src"),
    )


def _tf_all_from_tokens(tok: DataFrame) -> DataFrame:
    """(doc_id, token, tf) over the ENTIRE vocabulary — the production
    index shape (no fixture-sized term restriction)."""
    ex = tok.select("doc_id", F.explode("tokens").alias("token"))
    return ex.groupBy("doc_id", "token").agg(
        F.count("*").cast("long").alias("tf")
    )


def full_vocab_bm25(
    spark, docs: DataFrame, stage_dir: str | None = None
) -> DataFrame:
    """The PRODUCTION inverted-index shape (q251 — VERDICT r9 missing
    #3): q242's insert maintenance with the postings store built over
    ALL tokens, not the fixture's 3-term vocabulary, and the query
    answered by a PRUNED posting-list read of the persisted store.

    Build: the base slice's full-vocab postings are written
    range-clustered on ``token`` (``repartitionByRange`` → each file
    holds a contiguous term range, so parquet row-group min/max stats
    can skip whole files for any term predicate — the layout a
    query-pruned index needs at scale); the arrival batch appends the
    same way.  Query: the tf store is read back ``WHERE token IN
    (query terms)`` — the filter reaches the parquet scan as a pushed
    ``In`` predicate over term-clustered files (pinned in
    ``tests/test_lexical_index.py`` by inspecting the executed plan's
    PushedFilters), so query cost is the query terms' posting lists,
    never the full store.

    Output adds a ``vocab_size`` audit column = COUNT(DISTINCT token)
    over the persisted store — the one deliberately full-store
    aggregate, there to PROVE the store really is full-vocabulary (a
    3-term store would mismatch the oracle's corpus-wide vocabulary
    count and turn the driver row red); production serving runs only
    the pruned read.  Search equality with the 3-term build (q242) for
    the fixed query is pinned in ``tests/test_lexical_index.py``.

    The DuckDB oracle is the full BM25 recompute over store ∪ batch
    plus the corpus vocabulary count.  Scale: refresh O(|batch|
    tokens); query-time the pruned lists + one dl-store aggregate;
    vocab audit is store-sized but build-cadence only.  Reference
    anchor: ``FinalProject/BDM_Final.py`` (TF-IDF rebuilt per run;
    extension — no persisted index)."""
    import os

    from ..staging import staging_dir

    stage = stage_dir or staging_dir(prefix="bdm_bm25_full_")
    dl_dir = os.path.join(stage, "dl_store")
    tf_dir = os.path.join(stage, "tf_store")

    delta = _incr_delta_flag()
    base_tok = local_checkpoint(_doc_tokens(docs.filter(~delta)), eager=False)
    _dl_from_tokens(base_tok).write.mode("overwrite").parquet(dl_dir)
    _tf_all_from_tokens(base_tok).repartitionByRange(8, "token").write.mode(
        "overwrite"
    ).parquet(tf_dir)
    batch_tok = local_checkpoint(_doc_tokens(docs.filter(delta)), eager=False)
    _dl_from_tokens(batch_tok).write.mode("append").parquet(dl_dir)
    _tf_all_from_tokens(batch_tok).repartitionByRange(8, "token").write.mode(
        "append"
    ).parquet(tf_dir)

    dl = spark.read.parquet(dl_dir)
    tf_full = spark.read.parquet(tf_dir)
    vocab_row = tf_full.agg(
        F.countDistinct("token").cast("long").alias("vocab_size")
    )
    # the serving read: pruned to the query terms' posting lists
    tf = tf_full.filter(F.col("token").isin(*BM25_TERMS))
    return (
        _bm25_from_stores(dl, tf)
        .crossJoin(F.broadcast(vocab_row))
        .select(
            "doc_id",
            "bm25",
            F.when(_incr_delta_flag(), F.lit("batch"))
            .otherwise(F.lit("store"))
            .alias("src"),
            "vocab_size",
        )
    )


def full_vocab_bm25_sql() -> str:
    """Full recompute over store ∪ batch + the corpus-wide vocabulary
    count (which only a genuinely full-vocab store can reproduce)."""
    from ..functions.hashing import portable_hash64_sql

    from .dedup import INCR_LSH_BUCKETS, INCR_LSH_HIST

    delta = (
        f"({portable_hash64_sql('cast(doc_id as varchar)', 'ilsh')}"
        f" % {INCR_LSH_BUCKETS}) >= {INCR_LSH_HIST}"
    )
    return (
        f"SELECT doc_id, bm25,"
        f" CASE WHEN {delta} THEN 'batch' ELSE 'store' END AS src,"
        f" vocab_size"
        f" FROM ({_bm25_sql('TRUE', vocab=True)})"
    )


def upsert_aware_bm25_sql() -> str:
    """Full recompute over the t1 corpus (revised texts in place) + the
    carried/refreshed provenance column."""
    from ..functions.hashing import portable_hash64_sql

    from .dedup import INCR_UPD_BUCKETS, INCR_UPD_SUFFIX

    flag = (
        lambda c: f"({portable_hash64_sql(f'cast({c} as varchar)', 'iupd')}"
        f" % {INCR_UPD_BUCKETS}) = 0"
    )
    t1 = (
        f"(SELECT doc_id, CASE WHEN {flag('doc_id')} THEN text ||"
        f" '{INCR_UPD_SUFFIX}' ELSE text END AS text FROM documents) t1"
    )
    inner = _bm25_sql("TRUE", table=t1)
    return (
        f"SELECT doc_id, bm25,"
        f" CASE WHEN {flag('doc_id')} THEN 'refreshed' ELSE 'carried' END AS src"
        f" FROM ({inner})"
    )


def vacuumed_bm25_refresh(
    spark, docs: DataFrame, stage_dir: str | None = None
) -> DataFrame:
    """The full INVERTED-INDEX store lifecycle in one query (q269 —
    VERDICT r10 #4, the last store family without a GC cell; the q235
    mechanism on the lexical surface): build the t0 dl store (many
    small files — per-batch accretion) and the FULL-VOCAB tf store
    (q251's range-clustered-on-token layout), apply a deletion cycle
    (the q229 tombstone slice, salt "idel"), VACUUM both stores —
    tombstoned postings anti-joined out, files compacted,
    rename-swapped — then run the NEXT q242 insert refresh reading the
    VACUUMED stores back from parquet, with the SERVING read still
    pruned to the query terms' posting lists.

    The compaction detail that matters: the tf store's rewrite is
    ``repartitionByRange`` on token, NOT ``coalesce`` — q251's pruned
    read depends on term-clustered files for parquet min/max skipping,
    and a layout-oblivious compactor would keep every row while
    silently destroying file skipping.  PushedFilters on the
    post-vacuum read and file/row shrinkage are pinned in
    ``tests/test_lexical_index.py``.

    The DuckDB oracle is the full-vocab BM25 recompute over the
    REMAINING corpus (store ∪ batch minus deleted) with the q251
    ``vocab_size`` audit — a compaction that dropped or duplicated any
    posting list would shift idf/avgdl/vocab and red the driver row.

    Scale: vacuum is one anti-join + one range write per store on the
    compaction cadence; refresh O(|batch| tokens); serving reads only
    the query terms' lists + the dl-store aggregate.  Reference
    anchor: ``FinalProject/BDM_Final.py`` (TF-IDF rebuilt per run;
    extension — no persisted index, no deletes)."""
    import os

    from ..staging import staging_dir
    from .dedup import vacuum_parquet_store

    stage = stage_dir or staging_dir(prefix="bdm_bm25_vac_")
    dl_dir = os.path.join(stage, "dl_store")
    tf_dir = os.path.join(stage, "tf_store")

    delta = _incr_delta_flag()
    deleted = _incr_deleted_flag()
    t0_tok = local_checkpoint(_doc_tokens(docs.filter(~delta)), eager=False)
    # accretion: many small files per store (what a refresh loop leaves)
    _dl_from_tokens(t0_tok).repartition(8).write.mode("overwrite").parquet(
        dl_dir
    )
    _tf_all_from_tokens(t0_tok).repartitionByRange(8, "token").write.mode(
        "overwrite"
    ).parquet(tf_dir)
    tombstones = docs.filter(deleted).select("doc_id")
    vacuum_parquet_store(spark, dl_dir, tombstones, ("doc_id",))
    vacuum_parquet_store(
        spark,
        tf_dir,
        tombstones,
        ("doc_id",),
        target_files=4,
        range_cluster_cols=("token",),
    )
    # next insert refresh off the vacuumed stores: only the surviving
    # batch is ever tokenized
    batch_tok = local_checkpoint(
        _doc_tokens(docs.filter(delta & ~deleted)), eager=False
    )
    dl = spark.read.parquet(dl_dir).unionByName(_dl_from_tokens(batch_tok))
    tf_store = spark.read.parquet(tf_dir)
    batch_tf = _tf_all_from_tokens(batch_tok)
    vocab_row = (
        tf_store.unionByName(batch_tf)
        .agg(F.countDistinct("token").cast("long").alias("vocab_size"))
    )
    # the serving read: the store side prunes at the parquet scan
    tf = tf_store.filter(F.col("token").isin(*BM25_TERMS)).unionByName(
        batch_tf.filter(F.col("token").isin(*BM25_TERMS))
    )
    return (
        _bm25_from_stores(dl, tf)
        .crossJoin(F.broadcast(vocab_row))
        .select(
            "doc_id",
            "bm25",
            F.when(_incr_delta_flag(), F.lit("batch"))
            .otherwise(F.lit("store"))
            .alias("src"),
            "vocab_size",
        )
    )


def vacuumed_bm25_refresh_sql() -> str:
    """DuckDB twin: the full-vocab BM25 recompute over the REMAINING
    corpus + vocab audit + store/batch provenance — the identity the
    vacuumed-index refresh must reproduce."""
    from ..functions.hashing import portable_hash64_sql

    from .dedup import (
        INCR_DEL_BUCKETS,
        INCR_LSH_BUCKETS,
        INCR_LSH_HIST,
    )

    delta = (
        f"({portable_hash64_sql('cast(doc_id as varchar)', 'ilsh')}"
        f" % {INCR_LSH_BUCKETS}) >= {INCR_LSH_HIST}"
    )
    deleted = (
        f"({portable_hash64_sql('cast(doc_id as varchar)', 'idel')}"
        f" % {INCR_DEL_BUCKETS}) = 0"
    )
    return (
        f"SELECT doc_id, bm25,"
        f" CASE WHEN {delta} THEN 'batch' ELSE 'store' END AS src,"
        f" vocab_size"
        f" FROM ({_bm25_sql(f'NOT ({deleted})', vocab=True)})"
    )
