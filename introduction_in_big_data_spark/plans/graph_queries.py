"""Graph queries: iterative algorithms as DataFrame loops
(operators/graph.py). The customer↔supplier trade graph is derived
from orders⋈lineitem; node ids are disambiguated 2c / 2s+1 so the two
key spaces cannot collide."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.graph import pagerank, pagerank_oracle_sql
from .registry import register, t

_EDGES_CTE = """
    SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    UNION
    SELECT DISTINCT l_suppkey * 2 + 1 AS src, o_custkey * 2 AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""

_PR_ITERS = 5


@register(
    "pagerank_trade_graph",
    oracle=pagerank_oracle_sql(_EDGES_CTE, iters=_PR_ITERS),
    tags=("graph", "iterative"),
)
def pagerank_trade_graph(spark, sf_dir):
    """PageRank over the symmetric customer↔supplier trade graph —
    the engine's iterative-fixed-point shape beyond connected
    components: build iteration k+1 from iteration k's RESULT with
    lineage truncated each round (localCheckpoint), so 5 or 50
    iterations cost the same per-round plan. Fixed iteration count +
    rounded ranks make the whole loop hash-checkable against the
    unrolled-CTE DuckDB twin. Symmetric edges mean no dangling nodes;
    every float op (1/N seed, damping blend, contribution sums) is
    mirrored, with 1e-10 rounding absorbing float-sum order."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).select(
        (F.col("o_custkey") * 2).alias("c"), (F.col("l_suppkey") * 2 + 1).alias("s")
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .union(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .distinct()
    )
    return pagerank(edges, iters=_PR_ITERS)


@register(
    "triangle_count_copurchase",
    oracle="""
        WITH e AS (
            SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                            greatest(a.l_partkey, b.l_partkey) AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        deg AS (
            SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
                SELECT u AS node FROM e UNION ALL SELECT v FROM e
            ) GROUP BY node
        ),
        oriented AS (
            SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v)
                        THEN e.u ELSE e.v END AS a,
                   CASE WHEN (du.deg, e.u) < (dv.deg, e.v)
                        THEN e.v ELSE e.u END AS b,
                   CASE WHEN (du.deg, e.u) < (dv.deg, e.v)
                        THEN dv.deg ELSE du.deg END AS deg_b
            FROM e JOIN deg du ON du.node = e.u
                   JOIN deg dv ON dv.node = e.v
        ),
        wedges AS (
            SELECT w1.b AS x, w2.b AS y
            FROM oriented w1 JOIN oriented w2 ON w1.a = w2.a
            WHERE (w1.deg_b, w1.b) < (w2.deg_b, w2.b)
        ),
        marked AS (
            SELECT w.x, w.y, o.a IS NOT NULL AS hit
            FROM wedges w LEFT JOIN oriented o ON o.a = w.x AND o.b = w.y
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM oriented) AS n_edges,
               CAST(count(*) AS BIGINT) AS n_wedges,
               CAST(count(*) FILTER (WHERE hit) AS BIGINT) AS n_triangles
        FROM marked
    """,
    tags=("graph", "join", "scale"),
)
def triangle_count_copurchase(spark, sf_dir):
    """Exact triangle count on the part co-purchase graph (parts
    sharing an order — SPARSE, unlike the complete co-supplier graph:
    ~|orders|·C(items,2) edges over C(|parts|,2) slots) via
    degree-ordered orientation
    (operators/graph.triangle_count; Suri & Vassilvitskii WWW'11) —
    the join-explosion-bounded form: orienting each edge from its
    lower-(degree, id) endpoint caps every node's out-degree at
    O(sqrt(m)), so wedge intermediates total O(m^1.5) instead of the
    naive neighbor self-join's Σ deg² blow-up on hub nodes. Integer
    math end to end; n_wedges in the output is the orientation bound
    made visible."""
    from ..operators.graph import triangle_count

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("s1"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("s2"))
    edges = (
        a.join(b, "k")
        .filter(F.col("s1") < F.col("s2"))
        .select(F.col("s1").alias("src"), F.col("s2").alias("dst"))
        .distinct()
    )
    return triangle_count(edges)
