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


# ------------------------------------- degree-oriented triangles


def _tri_block_sql(sfx: str, edges: str) -> str:
    """The degree-orient-wedge-close SQL core, CTE names suffixed so
    one oracle can instantiate it twice (the sampled query runs it on
    the sampled edge set AND on the full set for its accuracy
    contract). ``edges`` is the name of a prior CTE with (u, v)
    columns, u < v, distinct."""
    return f"""
deg{sfx} AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d
    FROM (SELECT u AS node FROM {edges}
          UNION ALL SELECT v AS node FROM {edges})
    GROUP BY node
),
oriented{sfx} AS (
    SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END
             AS src,
           CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END
             AS dst,
           CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN du.d ELSE dv.d END
             AS sd,
           CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END
             AS dd
    FROM {edges} e JOIN deg{sfx} du ON e.u = du.node
                   JOIN deg{sfx} dv ON e.v = dv.node
),
tri{sfx} AS (
    SELECT COUNT(*) AS n_triangles
    FROM oriented{sfx} w1
    JOIN oriented{sfx} w2 ON w1.src = w2.src
                         AND (w1.dd, w1.dst) < (w2.dd, w2.dst)
    JOIN oriented{sfx} c ON c.src = w1.dst AND c.dst = w2.dst
)"""


_TRI_ORACLE = f"""
WITH cp AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
edges AS (
    SELECT DISTINCT a.p AS u, b.p AS v
    FROM cp a JOIN cp b ON a.o = b.o
    WHERE a.p < b.p
),{_tri_block_sql("", "edges")},
stats AS (
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg)
             AS n_wedges
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       n_wedges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       CASE WHEN n_wedges = 0 THEN 0
            ELSE (3 * n_triangles * 1000000) // n_wedges END
         AS closure_ppm
FROM stats, tri
"""


def _part_cooccur_edges(
    spark: SparkSession, sf_dir: str, keep_mod: int | None = None
) -> DataFrame:
    """Distinct undirected (u, v) edges (u < v) of the market-basket
    part-co-occurrence graph, eagerly pinned (the edge build feeds
    the degree agg AND the orientation join — racing-consumer
    lesson). With ``keep_mod`` = P, each edge is kept iff the first
    7 hex digits of md5("u|v") are ≡ 0 (mod P) — a DETERMINISTIC
    uniform 1/P edge sample (the Bloom filter's engine-bit-identical
    md5-slice device), applied BEFORE the distinct: the predicate
    depends only on (u, v), so filter-then-distinct ≡
    distinct-then-filter and the dedup shuffle shrinks by P too."""
    cp = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    pairs = (
        cp.alias("a")
        .join(cp.alias("b"), "o")
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
    )
    if keep_mod is not None:
        pairs = pairs.filter(
            F.expr(TRI_SAMPLE_HASH_SPARK) % keep_mod == 0
        )
    return pairs.distinct().localCheckpoint(eager=True)


def _oriented_triangles(edges: DataFrame):
    """The degree-orient-wedge-close core shared by the exact count
    and the DOULION-sampled estimator: returns (deg, tri) — the
    per-node degree frame and the 1-row triangle count. ``edges``
    must be distinct (u, v) with u < v, already pinned."""
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lo = (F.struct(F.col("du"), F.col("u"))
          < F.struct(F.col("dv"), F.col("v")))
    oriented = (
        edges.join(deg.select(F.col("node").alias("u"),
                              F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"),
                         F.col("d").alias("dv")), "v")
        .select(
            F.when(lo, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lo, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lo, F.col("dv")).otherwise(F.col("du")).alias("dd"),
        )
        .localCheckpoint(eager=True)  # three consumers below
    )
    w1 = oriented.select(
        F.col("src"), F.col("dst").alias("b"), F.col("dd").alias("db")
    )
    w2 = oriented.select(
        F.col("src"), F.col("dst").alias("c2"), F.col("dd").alias("dc")
    )
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c2")
    )
    tri = (
        w1.join(w2, "src")
        .filter(
            F.struct(F.col("db"), F.col("b"))
            < F.struct(F.col("dc"), F.col("c2"))
        )
        .join(closing, ["b", "c2"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg, tri


@register("graph_triangles", oracle=_TRI_ORACLE)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented triangle counting (Schank-Wagner orientation /
    Suri-Vassilvitskii MapReduce form, both public) over the
    market-basket graph: parts are connected when they co-occur in
    the same order — the canonical co-occurrence projection, and
    scale-honest WITHOUT any popularity cap because the per-order
    fan-out is bounded by order SIZE (TPC-H orders carry <= 7
    lineitems: <= 21 pairs per order, linear in lineitem). The
    customer-side projection was rejected: on this fixture every
    part has ~45 buyers, so that graph is near-complete — dense
    projections need the frequency caps real co-occurrence
    pipelines apply. Output: one row of graph
    stats (nodes, edges, wedges, triangles, global closure in ppm —
    the clustering coefficient as exact integer arithmetic).

    The scale-critical step is the ORIENTATION: each undirected edge
    points from its (degree, node)-smaller endpoint to the larger,
    so every triangle is counted exactly once (the unique node with
    two out-edges), and per-node out-degree is bounded by O(sqrt(m))
    on any graph — the wedge self-join is therefore near-linear in
    edges instead of sum-of-degrees-squared (a hub's d^2 wedge
    blow-up never materializes; this is why plain wedge-join dies on
    skewed graphs and oriented wedge-join does not).

    Plan shape: edge build = one equi-join keyed on order (bounded
    fan-out);
    degrees = one groupBy; the wedge join and the closing-edge join
    are equi-joins on node keys — no cartesian anywhere. All counts
    BIGINT; closure is integer ppm -> hash-exact.

    Reference parity: beyond-reference (north-star extension)."""
    edges = _part_cooccur_edges(spark, sf_dir)
    deg, tri = _oriented_triangles(edges)
    stats = edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        F.broadcast(
            deg.agg(
                F.count(F.lit(1)).alias("n_nodes"),
                # BIGINT div, not float '/': a hub past ~9.5e7
                # degree would round d*(d-1) in DOUBLE before the
                # cast and diverge from the oracle's exact '//'
                F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
            )
        )
    )
    return stats.crossJoin(F.broadcast(tri)).select(
        F.col("n_nodes").cast("long"),
        F.col("n_edges").cast("long"),
        "n_wedges",
        F.col("n_triangles").cast("long"),
        F.when(F.col("n_wedges") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr("(3 * n_triangles * 1000000) div n_wedges")
        )
        .alias("closure_ppm"),
    )


# --------------------------------- DOULION edge-sampled triangles

_TRI_P_INV = 4  # keep each edge w.p. 1/4 -> estimate = count * 64
_TRI_BOUND_PCT = 25  # |est - exact| <= 25% of exact (oracle-checked)

# The edge-sampling hash, once per engine (the test's per-edge
# parity check imports BOTH — never a hand copy): first 7 hex of
# md5("u|v") as a BIGINT.
TRI_SAMPLE_HASH_SPARK = (
    "cast(conv(substr(md5(concat(cast(u as string), '|',"
    " cast(v as string))), 1, 7), 16, 10) as bigint)"
)
_TRI_SAMPLE_PRED = (
    "(('0x' || substr(md5(u::VARCHAR || '|' || v::VARCHAR), 1, 7))"
    f"::BIGINT % {_TRI_P_INV}) = 0"
)

# The oracle instantiates the triangle core TWICE: once on the
# sampled edges (replaying the estimator exactly — hash-exact, the
# sampling is a deterministic md5 slice) and once on the full edge
# set to check the accuracy contract the Spark side CLAIMS with its
# literal TRUE. A violated bound hash-mismatches: this reverses
# a1b's direction (there Spark computes the contract and the oracle
# asserts TRUE; here the Spark side must stay exact-free — that is
# the entire point of the relief valve — so the oracle does the
# comparing). Exact-side cost lives only in DuckDB at sf0.01.
_TRI_SAMPLED_ORACLE = f"""
WITH cp AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
allpairs AS (
    SELECT a.p AS u, b.p AS v
    FROM cp a JOIN cp b ON a.o = b.o
    WHERE a.p < b.p
),
edges AS (
    SELECT DISTINCT u, v FROM allpairs WHERE {_TRI_SAMPLE_PRED}
),
edges_x AS (
    SELECT DISTINCT u, v FROM allpairs
),{_tri_block_sql("", "edges")},{_tri_block_sql("_x", "edges_x")},
est AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges)
             AS n_sampled_edges,
           (SELECT CAST(n_triangles AS BIGINT) FROM tri)
             AS n_sampled_triangles
)
SELECT CAST({_TRI_P_INV} AS BIGINT) AS p_inv,
       n_sampled_edges,
       n_sampled_edges * {_TRI_P_INV} AS est_edges,
       n_sampled_triangles,
       n_sampled_triangles * {_TRI_P_INV ** 3} AS est_triangles,
       ABS(n_sampled_triangles * {_TRI_P_INV ** 3}
           - (SELECT n_triangles FROM tri_x)) * 100
         <= {_TRI_BOUND_PCT} * (SELECT n_triangles FROM tri_x)
         AS claimed_within_bound
FROM est
"""


@register("graph_triangles_sampled", oracle=_TRI_SAMPLED_ORACLE)
def graph_triangles_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DOULION-style edge-sampled triangle ESTIMATE (Tsourakakis et
    al., KDD'09 — public): keep each distinct edge with probability
    p = 1/{pinv}, count triangles on the sampled graph with the SAME
    degree-oriented core as the exact query (shared
    _oriented_triangles), scale by 1/p^3. This is the 100 TB relief
    valve for the registry's heaviest exact operator
    (graph_triangles: sf10 = 1,470 s): wedge work scales ~p^2 and
    the closing join ~p, and the edge-sample predicate is pushed
    BEFORE the distinct so the edge-dedup shuffle shrinks by p too —
    measured {pinv}x-sampled DuckDB walls run ~20x faster at sf0.1.

    Determinism/accuracy contract (the a1b/a8b pattern, direction
    REVERSED): the sample is a deterministic md5 slice (the Bloom
    filter's engine-bit-identical device), so the estimate itself
    value-hashes — the oracle replays it exactly AND computes the
    exact count, checking |est - exact| <= {bound}% of exact against
    the literal TRUE this side claims. Spark never touches the exact
    count (that is what makes the valve a valve); a violated bound
    surfaces as a hash mismatch. Observed error at the three factory
    SFs: 3.5% / 1.2% / 0.3% (largest at the smallest graph, T=126k —
    binomial rel-sd ~2%), so the {bound}% bound carries >= 7x margin.

    The flag column is named CLAIMED_within_bound deliberately
    (round-10 advice): the Spark side asserts the contract as a
    literal, and the assertion is ADJUDICATED only where an oracle
    replays the input (the factory SFs the driver sweeps). On an
    unswept input the column is a claim, not a measurement — on a
    toy 3-edge graph the sample can keep 0 edges and estimate 0
    against an exact 1. Consumers at unswept scales should judge
    the estimate from the emitted confidence inputs instead:
    n_sampled_triangles and p_inv give the DOULION binomial
    rel-sd ~= sqrt((p_inv^3 - 1) / (n_sampled_triangles * p_inv^3)),
    which the {bound}% bound must clear with margin to trust the
    flag (>= ~170 sampled triangles for 2 sd at p_inv={pinv}).

    Reference parity: beyond-reference (north-star extension)."""
    edges = _part_cooccur_edges(spark, sf_dir, keep_mod=_TRI_P_INV)
    _, tri = _oriented_triangles(edges)
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_sampled_edges"))
    return n_edges.crossJoin(F.broadcast(tri)).select(
        F.lit(_TRI_P_INV).cast("long").alias("p_inv"),
        F.col("n_sampled_edges").cast("long"),
        (F.col("n_sampled_edges") * _TRI_P_INV)
        .cast("long")
        .alias("est_edges"),
        F.col("n_triangles").cast("long").alias("n_sampled_triangles"),
        (F.col("n_triangles") * _TRI_P_INV**3)
        .cast("long")
        .alias("est_triangles"),
        F.lit(True).alias("claimed_within_bound"),
    )


graph_triangles_sampled.__doc__ = graph_triangles_sampled.__doc__.format(
    pinv=_TRI_P_INV, bound=_TRI_BOUND_PCT
)
