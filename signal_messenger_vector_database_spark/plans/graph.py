"""Graph analytics as iterative dataflow (Pregel-lite on DataFrames).

``neardup_clusters`` (plans/similarity.py) already covers connected
components; this module adds PageRank — the canonical "iterate a sparse
matvec" workload — over the supplier↔customer co-transaction graph
(an edge per distinct (l_suppkey, o_custkey) pair, both directions).

Spark-first iteration shape, identical to MLlib/GraphX's PageRank core:
per round, rank/degree contributions flow along edges (a shuffle on the
edge key), partial-aggregate per destination, and the damping constant
re-injects mass.  Per-iteration driver state is NOTHING (the rank table
stays distributed); 3 pinned rounds unroll into the DuckDB oracle as
chained CTEs, the same fixed-iteration pairing trick as
``kmeans_lloyd3``.  At 100 TB the edge table is the fact: it shuffles
once per round on dst — bucketing edges by dst amortizes that across
rounds (noted in ARCHITECTURE.md), and convergence-driven stopping adds
a driver-side delta probe like kmeans_fit's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_round
from ..io.sources import load_table
from .registry import QuerySpec

_DAMP = 0.85
_ITERS = 3


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("a"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("b"),
        )
        .distinct()
    )
    return pairs.select("a", "b").union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def _pagerank3(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir).persist()
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).persist()
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n"))
    # ranks carry (deg, n) along; the rank table is O(nodes) small and
    # BROADCAST into every round, so the big edge table never shuffles for
    # the join — only partially-aggregated contributions cross the wire
    rank = deg.crossJoin(F.broadcast(n_nodes)).select(
        "a", "deg", (F.lit(1.0) / F.col("n")).alias("r"), "n"
    )
    for _ in range(_ITERS):
        contrib = (
            edges.join(F.broadcast(rank.select("a", "deg", "r")), "a")
            .groupBy(F.col("b").alias("a"))
            .agg(F.sum(F.col("r") / F.col("deg")).alias("mass"))
        )
        rank = rank.select("a", "deg", "n").join(F.broadcast(contrib), "a", "left").select(
            "a",
            "deg",
            (
                (1.0 - _DAMP) / F.col("n")
                + _DAMP * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("r"),
            "n",
        )
    return (
        rank.select(F.col("a").alias("node"), portable_round(F.col("r"), 8).alias("pr"))
        .orderBy(F.desc("pr"), "node")
        .limit(20)
    )


def _pagerank3_sql() -> str:
    it = """
r{n} AS (
  SELECT d.a, d.deg, (1.0 - {damp}) / nn.n + {damp} * COALESCE(m.mass, 0.0) AS r
  FROM deg d CROSS JOIN nn
  LEFT JOIN (
    SELECT e.b AS a, SUM(p.r / p.deg) AS mass
    FROM edges e JOIN r{prev} p ON e.a = p.a
    GROUP BY e.b
  ) m ON d.a = m.a
)"""
    rounds = "".join(
        "," + it.format(n=i, prev=i - 1, damp=_DAMP) for i in range(1, _ITERS + 1)
    )
    return f"""
WITH pairs AS (
  SELECT DISTINCT 's' || l_suppkey AS a, 'c' || o_custkey AS b
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
deg AS (SELECT a, COUNT(*) AS deg FROM edges GROUP BY a),
nn AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (SELECT d.a, d.deg, 1.0 / nn.n AS r FROM deg d CROSS JOIN nn){rounds}
SELECT a AS node, FLOOR(r * 100000000 + 0.5) / 100000000 AS pr
FROM r{_ITERS}
ORDER BY pr DESC, node
LIMIT 20
"""


SPECS: dict[str, QuerySpec] = {
    "pagerank3": QuerySpec(
        _pagerank3,
        _pagerank3_sql(),
        "3-round PageRank over the supplier-customer graph, oracle-unrolled CTEs",
    ),
}
