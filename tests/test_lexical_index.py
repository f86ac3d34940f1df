"""Incrementally maintained inverted index (q242/q243) — the q227
maintenance discipline on the LEXICAL index.

Four invariants:

* maintained search (merged persisted stores + freshly-indexed batch)
  == full-rebuild search, value-for-value;
* the same through a PERSISTED parquet store roundtrip (dl + postings
  written, read back, merged — the shape a daily refresh runs);
* deletion TOMBSTONES postings but must RESCORE survivors: the
  surviving docs' BM25 values change when the corpus shrinks (N,
  avgdl, df all move), so a carry-the-scores design is provably wrong
  — the test that pins why the stores hold postings, not scores;
* store vacuum (the q235 mechanism on dl/tf stores) preserves the
  delete-aware result exactly while compacting files.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import bigdatamining_graduate_spark.operators.lexical as LX
from bigdatamining_graduate_spark.operators.dedup import (
    _incr_deleted_flag,
    _incr_delta_flag,
    vacuum_parquet_store,
)

from .conftest import SF_SMOKE


def _docs(spark):
    from bigdatamining_graduate_spark.sources.catalog import load_table

    return load_table(spark, SF_SMOKE, "documents")


def _key(df):
    return sorted((r.doc_id, r.bm25) for r in df.collect())


def test_incremental_equals_full_rebuild(spark):
    docs = _docs(spark)
    maintained = LX.incremental_bm25(docs)
    full = LX._bm25_from_stores(
        LX.doc_lengths(docs), LX.term_postings(docs)
    )
    assert _key(maintained) == _key(full)
    assert maintained.count() > 0


def test_index_store_roundtrip(spark, tmp_path):
    docs = _docs(spark)
    base = docs.filter(~_incr_delta_flag())
    LX.doc_lengths(base).write.parquet(str(tmp_path / "dl"))
    LX.term_postings(base).write.parquet(str(tmp_path / "tf"))
    roundtrip = LX.incremental_bm25(
        docs,
        dl_store=spark.read.parquet(str(tmp_path / "dl")),
        tf_store=spark.read.parquet(str(tmp_path / "tf")),
    )
    assert _key(roundtrip) == _key(LX.incremental_bm25(docs))


def test_delete_rescores_survivors(spark):
    """The design-pinning test: after deletion the top-20 must equal
    the full rebuild over the remaining corpus — and at least one
    SURVIVING doc's score must differ from its pre-delete value
    (idf/avgdl moved), so carrying scores across a delete would be
    wrong, not merely stale."""
    docs = _docs(spark)
    after = LX.delete_aware_bm25(docs)
    full_remaining = LX._bm25_from_stores(
        LX.doc_lengths(docs.filter(~_incr_deleted_flag())),
        LX.term_postings(docs.filter(~_incr_deleted_flag())),
    )
    assert _key(after) == _key(full_remaining)
    # no tombstoned doc in the result
    assert after.filter(_incr_deleted_flag()).count() == 0
    before = {r.doc_id: r.bm25 for r in LX._bm25_from_stores(
        LX.doc_lengths(docs), LX.term_postings(docs)
    ).collect()}
    moved = [
        r for r in after.collect()
        if r.doc_id in before and r.bm25 != before[r.doc_id]
    ]
    assert moved, "deletion moved no survivor's score — fixture degenerate"


def test_store_vacuum_preserves_search(spark, tmp_path):
    """q243 through the PHYSICAL store lifecycle: dl/tf stores written
    as 4 small files each, tombstoned via the q235 vacuum (rows
    dropped, files compacted to 1), then searched — identical to the
    in-plan delete-aware result."""
    docs = _docs(spark)
    dl_dir, tf_dir = str(tmp_path / "dl"), str(tmp_path / "tf")
    LX.doc_lengths(docs).repartition(4).write.parquet(dl_dir)
    LX.term_postings(docs).repartition(4).write.parquet(tf_dir)
    tomb = docs.filter(_incr_deleted_flag()).select("doc_id")
    a1 = vacuum_parquet_store(spark, dl_dir, tomb, ("doc_id",))
    a2 = vacuum_parquet_store(spark, tf_dir, tomb, ("doc_id",))
    assert a1["files_before"] == 4 and a1["files_after"] == 1
    assert a2["rows_after"] <= a2["rows_before"]
    vacuumed = LX._bm25_from_stores(
        spark.read.parquet(dl_dir), spark.read.parquet(tf_dir)
    )
    assert _key(vacuumed) == _key(LX.delete_aware_bm25(docs))
