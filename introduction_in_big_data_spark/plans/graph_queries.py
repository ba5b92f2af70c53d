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
