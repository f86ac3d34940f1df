"""Cross-store atomic publish (q271, ``sources/publish.py``): the
manifest-pointer commit must make a multi-store refresh all-or-nothing.

Invariants:

* a reader resolving through the pointer sees BOTH stores at the same
  committed version — before, during, and after a publish;
* a crash between the two store writes (or after both writes but before
  the pointer flip) leaves the OLD version pair fully readable;
* the flip itself is one ``os.replace`` — no state where store A is v2
  and store B is v1.
"""

from __future__ import annotations

import os

from bigdatamining_graduate_spark.sources import publish as PB


def _mk(spark, vals, col="x"):
    return spark.createDataFrame([(v,) for v in vals], f"{col} long")


def _vals(df, col="x"):
    return sorted(r[col] for r in df.collect())


def test_publish_and_read_through_pointer(spark, tmp_path):
    root = str(tmp_path / "root")
    PB.publish_version(
        root, 1, {"a": _mk(spark, [1, 2]), "b": _mk(spark, [10, 20])}
    )
    assert PB.current_version(root) == 1
    assert _vals(PB.read_current(spark, root, "a")) == [1, 2]
    assert _vals(PB.read_current(spark, root, "b")) == [10, 20]
    PB.publish_version(
        root, 2, {"a": _mk(spark, [3]), "b": _mk(spark, [30])}
    )
    assert PB.current_version(root) == 2
    assert _vals(PB.read_current(spark, root, "a")) == [3]
    assert _vals(PB.read_current(spark, root, "b")) == [30]
    # old version directories are untouched (immutable; GC is a later,
    # separate vacuum cadence)
    assert os.path.isdir(os.path.join(root, "a", "v1"))


def test_crash_between_store_writes_is_invisible(spark, tmp_path):
    """Simulate the publish crashing after writing store A's v2 but
    before store B's v2 and before the flip: readers must still see the
    complete v1 PAIR.  Then complete the publish and see the v2 pair —
    never a mix."""
    root = str(tmp_path / "root")
    PB.publish_version(
        root, 1, {"a": _mk(spark, [1, 2]), "b": _mk(spark, [10, 20])}
    )
    # crash point 1: only store A's v2 written
    PB.write_store_version(_mk(spark, [3]), root, "a", 2)
    assert PB.current_version(root) == 1
    assert _vals(PB.read_current(spark, root, "a")) == [1, 2]
    assert _vals(PB.read_current(spark, root, "b")) == [10, 20]
    # crash point 2: both v2 directories written, pointer not flipped
    PB.write_store_version(_mk(spark, [30]), root, "b", 2)
    assert PB.current_version(root) == 1
    assert _vals(PB.read_current(spark, root, "a")) == [1, 2]
    assert _vals(PB.read_current(spark, root, "b")) == [10, 20]
    # recovery: re-running the publish is idempotent (immutable version
    # dirs overwrite with identical content) and the flip commits both
    PB.publish_version(
        root, 2, {"a": _mk(spark, [3]), "b": _mk(spark, [30])}
    )
    assert PB.current_version(root) == 2
    assert _vals(PB.read_current(spark, root, "a")) == [3]
    assert _vals(PB.read_current(spark, root, "b")) == [30]


def test_pointer_flip_is_single_atomic_rename(tmp_path):
    """The only reader-visible mutation is os.replace of CURRENT — the
    tmp file never survives, and the pointer always parses."""
    root = str(tmp_path / "root")
    os.makedirs(root)
    PB.commit_version(root, 7)
    assert PB.current_version(root) == 7
    assert not os.path.exists(os.path.join(root, "CURRENT.tmp"))
    PB.commit_version(root, 8)
    assert PB.current_version(root) == 8


def test_time_travel_reads_are_reproducible(spark, tmp_path):
    """q272's primitive: after CURRENT moves to v2, read_version(1)
    still reproduces the v1 snapshot exactly — immutability IS the
    change log."""
    root = str(tmp_path / "root")
    PB.publish_version(
        root, 1, {"a": _mk(spark, [1, 2]), "b": _mk(spark, [10])}
    )
    PB.publish_version(root, 2, {"a": _mk(spark, [3]), "b": _mk(spark, [30])})
    assert PB.current_version(root) == 2
    assert _vals(PB.read_version(spark, root, "a", 1)) == [1, 2]
    assert _vals(PB.read_version(spark, root, "b", 1)) == [10]
    assert _vals(PB.read_version(spark, root, "a", 2)) == [3]


def test_version_gc_removes_old_keeps_retained(spark, tmp_path):
    """q276's primitive: gc_versions(retain=2) physically deletes every
    version outside the retention window across all stores, keeps the
    newest two readable (time travel included), and never touches the
    pointer."""
    import os

    root = str(tmp_path / "root")
    PB.publish_version(root, 1, {"a": _mk(spark, [1]), "b": _mk(spark, [10])})
    PB.publish_version(root, 2, {"a": _mk(spark, [2]), "b": _mk(spark, [20])})
    PB.publish_version(root, 3, {"a": _mk(spark, [3]), "b": _mk(spark, [30])})
    audit = PB.gc_versions(root, retain=2)
    assert sorted(audit["removed"]) == [("a", 1), ("b", 1)]
    assert audit["kept_per_store"] == {"a": 2, "b": 2}
    assert not os.path.exists(os.path.join(root, "a", "v1"))
    assert PB.current_version(root) == 3
    assert _vals(PB.read_current(spark, root, "a")) == [3]
    assert _vals(PB.read_version(spark, root, "b", 2)) == [20]
    # idempotent: a second GC removes nothing
    assert PB.gc_versions(root, retain=2)["removed"] == []
