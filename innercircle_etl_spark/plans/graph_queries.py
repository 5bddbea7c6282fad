"""Iterative graph analytics over the order graph.

The reference's collection-similarity job (update_etl.py:1447-1477)
is its only graph-shaped computation (driver-side O(n²) pandas).
`dedup_cluster_canonical` already covers label propagation /
connected components; this module adds the other canonical iterative
shape — PageRank — as a DataFrame loop, the pattern for any
fixed-point computation at cluster scale (each iteration is one
shuffle on dst; lineage stays 3 deep here, longer loops checkpoint
every ~10 iterations to truncate it).

Determinism discipline: all arithmetic is INTEGER fixed-point
(rank units of 1e-12). Float PageRank sums are order-dependent and
would never value-hash across engines; integral `div` truncation is
bit-defined in both Spark and DuckDB, so three iterations unrolled
in SQL reproduce the loop exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from innercircle_etl_spark.plans.registry import load, register

_SCALE = 1_000_000_000_000  # 1e12 fixed-point rank units
_SUPP_OFFSET = 1_000_000  # suppliers renumbered above customers
_ITERS = 3

# One iteration in DuckDB SQL, parameterized by the previous ranks CTE.
# contribution = r div outdeg (truncating); new rank =
# (3*SCALE) // (20*N)  +  (17 * sum_contrib) // 20      (d = 0.85)
_DUCK_ITER = """
{name} AS (
    SELECT n.node,
           (3 * {scale}::BIGINT) // (20 * (SELECT n FROM nn))
           + (17 * COALESCE(c.s, 0)) // 20 AS r
    FROM nodes n
    LEFT JOIN (
        SELECT e.dst AS node,
               CAST(SUM(p.r // d.outdeg) AS BIGINT) AS s
        FROM edges e
        JOIN {prev} p ON e.src = p.node
        JOIN deg d ON e.src = d.node
        GROUP BY e.dst
    ) c ON n.node = c.node
)"""

_PR_ORACLE = (
    """
WITH e0 AS (
    SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + %d AS s
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (
    SELECT c AS src, s AS dst FROM e0
    UNION ALL
    SELECT s AS src, c AS dst FROM e0
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (
    SELECT node, {scale}::BIGINT // (SELECT n FROM nn) AS r FROM nodes
),"""
    % _SUPP_OFFSET
    + ",".join(
        _DUCK_ITER.format(name=f"r{i + 1}", prev=f"r{i}", scale="{scale}")
        for i in range(_ITERS)
    )
    + f"""
SELECT node, CAST(r AS BIGINT) AS rank_fp
FROM r{_ITERS}
"""
).replace("{scale}", str(_SCALE))


@register("graph_pagerank3", oracle=_PR_ORACLE)
def graph_pagerank3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85) over the undirected
    customer-supplier order graph — the iterative-DataFrame-loop
    member of the inventory. Per iteration: one equi-join of edges
    to current ranks (src) and one shuffle-aggregate on dst —
    exactly the two-exchange step a 100TB graph pays, with the
    degree table joined once up front and the node list reused as
    the left spine so rank mass for in-degree-0 nodes stays exact.

    Fixed-point integer arithmetic end to end (units of 1e-12, all
    divisions truncating) — deterministic under any partitioning
    and bit-identical to the unrolled SQL oracle; the truncation
    bias (< 20 units/iteration) is the documented price of
    cross-engine exactness. Dangling-node mass leaks as in the
    classic simplified formulation; both sides mirror it."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("s"),
        )
        .distinct()
    )
    edges = e0.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        e0.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    # edges drive every iteration: cache once, reuse three times
    edges = edges.cache()
    nodes = edges.select(F.col("src").alias("node")).distinct().cache()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # degree rides WITH the rank state so the per-iteration join is
    # a single equi-join on src (contribution needs r and outdeg of
    # the same node anyway)
    n_nodes = nodes.count()  # scalar: sizes the base term exactly
    base = (3 * _SCALE) // (20 * n_nodes)

    ranks = nodes.join(deg, "node", "left").select(
        "node",
        F.lit(_SCALE // n_nodes).alias("r"),
        F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
    )
    for _ in range(_ITERS):
        contrib = (
            edges.join(
                ranks.select(
                    F.col("node").alias("src"),
                    F.expr("r div outdeg").alias("c"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            ranks.select("node", "outdeg")
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("(17 * coalesce(s, 0)) div 20")
                ).alias("r"),
                "outdeg",
            )
        )
    return ranks.select("node", F.col("r").alias("rank_fp"))
