"""Semantic tests for the round-3 batch: triangles (q110), relational
division (q109), scalar quantization (q111), state intervals (q112)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamining_graduate_spark.operators import graph as GR
from bigdatamining_graduate_spark.plans.queries import QUERIES

from .conftest import SF_SMOKE


def _li(spark, orders):
    """lineitem-shaped frame from {orderkey: [partkeys]}."""
    rows = [(o, p) for o, parts in orders.items() for p in parts]
    return spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])


def test_triangle_counts_known_graph(spark):
    """One order with parts {1,2,3,4} is a K4: C(4,3)=4 triangles, every
    node in exactly 3 of them with degree 3. A disjoint 2-path (5-6-7 via
    two orders) closes no triangle."""
    li = _li(spark, {10: [1, 2, 3, 4], 20: [5, 6], 30: [6, 7]})
    out = {r["node"]: (r["deg"], r["tri_cnt"]) for r in GR.triangle_counts(li).collect()}
    assert out == {1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (3, 3)}


def test_triangle_orientation_counts_each_once(spark):
    """A single triangle is counted exactly once per node even though the
    wedge join sees it from every vertex: 3 rows, tri_cnt=1 each."""
    li = _li(spark, {1: [7, 8], 2: [8, 9], 3: [7, 9]})
    rows = GR.triangle_counts(li).collect()
    assert sorted((r["node"], r["deg"], r["tri_cnt"]) for r in rows) == [
        (7, 2, 1), (8, 2, 1), (9, 2, 1),
    ]


def test_division_requires_every_region(spark):
    """q109 keeps only parts whose distinct region count equals |region| —
    no part may appear with a partial count."""
    df = QUERIES["q109_parts_in_all_regions"](spark, SF_SMOKE)
    n_regions = df.select("n_regions").distinct().collect()
    assert all(r["n_regions"] == 5 for r in n_regions)


def test_quantization_codes_bounded_and_monotone(spark):
    """Codes are 0..255; the per-dim max element maps to 255 and the min
    to 0, so code_max=255 must appear and code_possum is consistent with
    code_sum bounds (possum <= 64 * code_sum for 64 dims)."""
    out = QUERIES["q111_embedding_quantization"](spark, SF_SMOKE)
    rows = out.collect()
    assert rows, "no vectors"
    assert all(0 <= r["code_max"] <= 255 for r in rows)
    assert all(0 <= r["code_sum"] <= 255 * 64 for r in rows)
    assert all(r["code_sum"] <= r["code_possum"] <= 64 * r["code_sum"] for r in rows)
    assert max(r["code_max"] for r in rows) == 255


def test_state_intervals_partition_events_exactly(spark):
    """q112 conservation: per user, run n_events sums to the user's event
    count; exactly one open (NULL valid_to) interval per user; intervals
    are non-overlapping and ordered (valid_from < valid_to)."""
    from bigdatamining_graduate_spark.sources.catalog import load_table

    out = QUERIES["q112_user_state_intervals"](spark, SF_SMOKE).cache()
    ev = load_table(spark, SF_SMOKE, "events")
    per_user = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    got = {
        r["user_id"]: r["s"]
        for r in out.groupBy("user_id").agg(F.sum("n_events").alias("s")).collect()
    }
    assert got == per_user
    opens = {
        r["user_id"]: r["n"]
        for r in out.filter(F.col("valid_to_us").isNull())
        .groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(opens.values()) == {1}
    bad = out.filter(
        F.col("valid_to_us").isNotNull() & (F.col("valid_to_us") <= F.col("valid_from_us"))
    ).count()
    assert bad == 0
    out.unpersist()


def test_cdc_merge_applies_changes_exactly(spark):
    """q116 conservation: deleted keys absent, updated keys re-statused
    with +10% price, inserted keys are shifted copies, everything else
    passes through untouched."""
    from bigdatamining_graduate_spark.plans.queries import (
        _CDC_DEL,
        _CDC_INS,
        _CDC_KEY_SHIFT,
        _CDC_UPD,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    out = QUERIES["q116_cdc_merge"](spark, SF_SMOKE).cache()
    od = load_table(spark, SF_SMOKE, "orders")
    n = od.count()
    n_del = od.filter(F.col("o_orderkey") % _CDC_DEL == 0).count()
    n_upd = od.filter(
        (F.col("o_orderkey") % _CDC_UPD == 0) & (F.col("o_orderkey") % _CDC_DEL != 0)
    ).count()
    n_ins = od.filter(F.col("o_orderkey") % _CDC_INS == 0).count()
    by_src = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert by_src.get("updated", 0) == n_upd
    assert by_src.get("inserted", 0) == n_ins
    assert by_src.get("base", 0) == n - n_del - n_upd
    # no deleted key survives; every inserted key is shifted out of range
    assert out.filter((F.col("o_orderkey") % _CDC_DEL == 0) & (F.col("o_orderkey") < _CDC_KEY_SHIFT)).count() == 0
    assert out.filter(F.col("src") == "inserted").filter(F.col("o_orderkey") < _CDC_KEY_SHIFT).count() == 0
    assert all(r["o_orderstatus"] == "U" for r in out.filter(F.col("src") == "updated").select("o_orderstatus").distinct().collect())
    out.unpersist()


def test_streaming_checkpoint_resume_exactly_once(spark, tmp_path):
    """Checkpointed restart is EXACTLY-ONCE end to end: a file-source →
    parquet-sink stream drains batch 1, stops, batch 2 arrives, and a
    SECOND query restarted from the same checkpoint emits batch 2's rows
    ONLY (source offsets recovered, batch 1 never re-read); a third
    restart with no new data emits nothing (idempotent). This is the
    recovery contract every production streaming job leans on — state
    survives the process, not the session."""
    import os

    indir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir)

    def batch(ids, name):
        spark.createDataFrame([(i,) for i in ids], "event_id long").coalesce(
            1
        ).write.parquet(str(tmp_path / name))
        import glob
        import shutil

        src = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        shutil.move(src, os.path.join(indir, f"{name}.parquet"))

    def drain():
        q = (
            spark.readStream.schema("event_id long")
            .parquet(indir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        return sorted(
            r["event_id"] for r in spark.read.parquet(out).collect()
        )

    batch(range(0, 5), "b1")
    assert drain() == list(range(0, 5))
    batch(range(5, 9), "b2")
    assert drain() == list(range(0, 9))  # b1 NOT duplicated
    assert drain() == list(range(0, 9))  # no data -> no emission


def test_observe_metrics_piggyback_on_action(spark):
    """`df.observe` collects aggregate metrics DURING the action — no
    second scan. At 100 TB this is how row-count / quality gauges ride
    along with the real job instead of doubling its cost. Pins that the
    observed metrics equal what a separate aggregation would return."""
    from pyspark.sql import Observation

    from bigdatamining_graduate_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    obs = Observation("li_metrics")
    flagged = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("l_discount") > 0.05).cast("long")).alias("n_discounted"),
    )
    out = flagged.filter(F.col("l_quantity") > 0).count()
    expected = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_discount") > 0.05).cast("long")).alias("d"),
    ).collect()[0]
    got = obs.get
    assert got["n_rows"] == expected["n"] and out <= got["n_rows"]
    assert got["n_discounted"] == expected["d"]


def test_udtf_extension_point_matches_jvm_json_path(spark):
    """Python UDTF (Spark 3.5+ table-function extension point): a
    row-expanding parser registered and invoked with LATERAL from SQL.
    Like the custom DataSource, this pins the EXTENSION surface — for
    formats Spark's built-ins can parse (JSON here), the JVM path is
    the production choice, and the test proves both produce identical
    rows."""
    import json

    from pyspark.sql.functions import udtf

    from bigdatamining_graduate_spark.sources.catalog import load_table

    @udtf(returnType="key string, val bigint")
    class ParseProps:
        def eval(self, props: str):
            if props:
                for k, v in json.loads(props).items():
                    yield k, int(v)

    spark.udtf.register("parse_props", ParseProps)
    load_table(spark, SF_SMOKE, "events").createOrReplaceTempView("ev")
    via_udtf = spark.sql(
        "SELECT e.event_id, t.key, t.val FROM ev e, LATERAL parse_props(e.props) t"
    )
    via_jvm = spark.sql(
        """SELECT event_id, 'k' AS key, get_json_object(props, '$.k') AS val
           FROM ev WHERE props IS NOT NULL"""
    ).selectExpr("event_id", "key", "cast(val as bigint) as val")
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_jvm.collect()))
    assert a == b and len(a) > 0


def test_q168_cmsketch_overestimates_and_is_tiny(spark):
    """CM-sketch invariants q168's oracle can't express: (1) every
    estimate >= the exact count (CM never underestimates), (2) the
    sketch itself is bounded at d*w cells regardless of vocabulary —
    the property that makes it mergeable state at 100 TB, (3) the
    relative overestimate on heavy hitters stays small (w >> heavy
    bucket load)."""
    from bigdatamining_graduate_spark.plans.queries import (
        _CMS_D,
        _CMS_W,
        QUERIES,
    )

    rows = QUERIES["q168_cmsketch_heavy_hitters"](spark, SF_SMOKE).collect()
    assert rows, "fixture must yield heavy hitters"
    assert all(r.overest >= 0 for r in rows)
    assert all(r.est_count >= r.exact_count for r in rows)
    # heavy hitters sit in hot cells, but 4x512 cells over a ~10k-token
    # vocab keeps collisions light: overestimate well under the count
    assert all(r.overest <= r.exact_count for r in rows), rows
    assert _CMS_D * _CMS_W == 2048


def test_q169_lpa_structure(spark):
    """LPA invariants beyond the value oracle: every community label is
    itself a graph node (labels only ever propagate from the initial
    node-id labeling), and the support-thresholded graph yields real
    structure — more than one community, fewer than one per node."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES

    rows = QUERIES["q169_part_communities"](spark, SF_SMOKE).collect()
    nodes = {r.node for r in rows}
    labels = {r.community for r in rows}
    assert labels <= nodes
    assert 1 < len(labels) < len(nodes)


def test_q170_kcore_invariant(spark):
    """The defining k-core property, checked directly on the result:
    every surviving node's degree WITHIN the core is >= k (the oracle
    hash-match proves engine parity; this proves both engines computed
    an actual k-core)."""
    from bigdatamining_graduate_spark.operators.graph import KCORE_K
    from bigdatamining_graduate_spark.plans.queries import QUERIES

    rows = QUERIES["q170_part_kcore"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r.core_deg >= KCORE_K for r in rows)
