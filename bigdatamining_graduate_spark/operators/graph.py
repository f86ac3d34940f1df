"""Graph mining: integer-arithmetic PageRank over a co-purchase graph.

Complements the connected-components operator (``dedup.neardup_components``)
with the other canonical iterative graph algorithm of a "big data mining"
engine. Two design decisions carry the scale and correctness story:

* **Fixed-point integer mass, not floats.** Float PageRank is not
  cross-engine reproducible: per-node rank is a SUM of contributions and
  float addition is order-dependent, so Spark's partition-parallel sums
  and DuckDB's sequential sums drift apart after a few iterations. Here
  rank is an integer mass (TOTAL_MASS units split evenly at start) and
  every transfer is exact integer arithmetic — ``(85 * r) div
  (100 * deg)`` — identical in any engine and at any parallelism. Mass
  lost to the floors is the deterministic price; rankings are unaffected
  (the floor error is ≤ deg per node per round, orders of magnitude
  below rank differences).
* **Bounded edge generation.** Co-purchase edges come from a self-join
  of (order, part) ON the order key — an equi-join whose fanout is
  C(basket size, 2), bounded by the basket, never an all-pairs join.

Iteration shape mirrors the CC loop: edges materialized once
(``localCheckpoint``), each round is one join + one aggregation with a
constant-size plan, ranks re-checkpointed per round. The oracle unrolls
the same recurrence as K chained CTEs (aggregates are not allowed in a
recursive CTE member, and K is a fixed constant anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMP_NUM = 85          # damping 0.85 as an exact fraction
DAMP_DEN = 100
TOTAL_MASS = 10**12    # fixed-point scale: initial rank = TOTAL_MASS / N
N_ITER = 6


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected co-purchase edges between parts appearing in the same
    order, as a directed edge list with per-source out-degree. DISTINCT
    (order, part) first, pair by order-key equi-join (a < b), then both
    directions."""
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    edges = pairs.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionByName(pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    return edges.join(deg, "src")


def integer_pagerank(lineitem: DataFrame, n_iter: int = N_ITER) -> DataFrame:
    """(node, rank_mass) after ``n_iter`` exact-integer PageRank rounds
    over the co-purchase graph. The symmetric edge list means every node
    has in- and out-edges, so no dangling-mass handling is needed."""
    edges = copurchase_edges(lineitem).localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    base = (DAMP_DEN - DAMP_NUM) * TOTAL_MASS // (DAMP_DEN * n)
    ranks = nodes.select(
        "node", F.lit(TOTAL_MASS // n).cast("long").alias("r")
    ).localCheckpoint()
    contrib = F.expr(f"({DAMP_NUM} * r) div ({DAMP_DEN} * deg)")
    for _ in range(n_iter):
        ranks = (
            edges.join(ranks, edges.src == ranks.node)
            .select("dst", contrib.alias("c"))
            .groupBy("dst")
            .agg((F.lit(base) + F.sum("c")).cast("long").alias("r"))
            .select(F.col("dst").alias("node"), "r")
            .localCheckpoint()
        )
    return ranks.select("node", F.col("r").alias("rank_mass"))


def integer_pagerank_sql(n_iter: int = N_ITER, top: int | None = None) -> str:
    """DuckDB twin: the same integer recurrence unrolled as chained CTEs.
    ``base`` depends on the node count, so it is computed in SQL from the
    same edge table."""
    # AS MATERIALIZED: DuckDB inlines plain CTEs, which would re-expand
    # the 6M-row self-join chain once per unrolled iteration (measured:
    # minutes at 10x facts vs ~2 s materialized)
    ctes = [
        f"""op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
    pairs AS MATERIALIZED (
      SELECT DISTINCT a.p AS pa, b.p AS pb
      FROM op a JOIN op b ON a.k = b.k AND a.p < b.p
    ),
    edges0 AS MATERIALIZED (
      SELECT pa AS src, pb AS dst FROM pairs
      UNION ALL SELECT pb AS src, pa AS dst FROM pairs
    ),
    deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges0 GROUP BY src),
    edges AS MATERIALIZED (SELECT e.src, e.dst, d.deg FROM edges0 e JOIN deg d ON d.src = e.src),
    meta AS MATERIALIZED (
      SELECT count(*) AS n,
             ({DAMP_DEN} - {DAMP_NUM}) * {TOTAL_MASS}::BIGINT
               // ({DAMP_DEN} * count(*)) AS base,
             {TOTAL_MASS}::BIGINT // count(*) AS r0
      FROM (SELECT DISTINCT src FROM edges0)
    ),
    pr0 AS MATERIALIZED (SELECT src AS node, (SELECT r0 FROM meta) AS r
            FROM (SELECT DISTINCT src FROM edges0))"""
    ]
    for k in range(1, n_iter + 1):
        ctes.append(
            f"""pr{k} AS MATERIALIZED (
      SELECT e.dst AS node,
             cast((SELECT base FROM meta)
               + sum(({DAMP_NUM} * p.r) // ({DAMP_DEN} * e.deg)) as bigint) AS r
      FROM edges e JOIN pr{k - 1} p ON p.node = e.src
      GROUP BY e.dst
    )"""
        )
    limit = (
        f"ORDER BY rank_mass DESC, node ASC LIMIT {top}" if top is not None else ""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, r AS rank_mass FROM pr{n_iter} {limit}"
    )
