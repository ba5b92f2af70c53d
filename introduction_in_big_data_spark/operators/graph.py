"""Iterative graph algorithms as DataFrame loops — the pattern for
fixed-point computation on an engine with no native iteration:
build iteration k+1's plan from iteration k's RESULT (not its plan),
truncating lineage each round so the DAG stays constant-size.

Connected components (min-label propagation) lives in
operators/dedup.py; this module adds PageRank — the canonical
"iterate until converged" workload — with a FIXED iteration count so
the result is deterministic and oracle-checkable (the DuckDB twin
unrolls the same iterations as chained CTEs).

Scale: each iteration is one join (edges ⋈ ranks, both partitioned by
the join key) + one aggregate — linear in |E|. The localCheckpoint
between iterations is what makes 50-iteration runs viable: without
it the logical plan doubles each round and Catalyst analysis time
explodes long before the data does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import barrier


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    round_scale: int = 10,
) -> DataFrame:
    """PageRank with `iters` synchronous power iterations over a
    directed edge list. rank_0 = 1/N; rank_{k+1}(v) = (1-d)/N +
    d * Σ_{u→v} rank_k(u)/outdeg(u). No dangling-mass redistribution
    (callers wanting it add a sink node); the oracle does the same.
    Final ranks rounded to `round_scale` decimals so independent
    float-sum orders (Spark partial aggs vs any other engine) agree.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()  # one scalar job; N is a plan constant after this
    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg) is loop-invariant: materialize once
    contrib_edges = edges.join(outdeg, src).transform(barrier)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contribs = (
            contrib_edges.join(
                ranks.select(F.col("node").alias(src), "rank"), src
            )
            .groupBy(dst)
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            nodes.join(
                contribs.select(F.col(dst).alias("node"), "c"), "node", "left"
            )
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
            # truncate lineage: keep the plan O(1) per iteration
            .transform(barrier)
        )
    return ranks.select("node", F.round("rank", round_scale).alias("rank"))


def pagerank_oracle_sql(
    edges_cte: str,
    iters: int = 5,
    damping: float = 0.85,
    round_scale: int = 10,
) -> str:
    """DuckDB twin: the same fixed iterations UNROLLED as chained CTEs
    (no recursive CTE — aggregation per step is clearer unrolled, and
    the iteration count is part of the contract). `edges_cte` must
    select columns (src, dst)."""
    parts = [
        f"WITH edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)",
    ]
    for k in range(iters):
        parts.append(
            f"r{k + 1} AS ("
            f" SELECT nodes.node,"
            f"  (1.0 - {damping}) / nn.n + {damping} * coalesce(c.c, 0.0) AS rank"
            f" FROM nodes CROSS JOIN nn LEFT JOIN ("
            f"  SELECT e.dst AS node, sum(r.rank / o.outdeg) AS c"
            f"  FROM edges e JOIN outdeg o ON e.src = o.src"
            f"  JOIN r{k} r ON e.src = r.node GROUP BY e.dst"
            f" ) c ON nodes.node = c.node)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, round(rank, {round_scale}) AS rank FROM r{iters}"
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count via degree-ordered orientation — the
    standard trick that makes distributed triangle counting feasible
    (Suri & Vassilvitskii, WWW'11 "Counting Triangles and the Curse of
    the Last Reducer"): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, so each node's
    out-degree is bounded by O(sqrt(m)) and the wedge join generates
    O(m^1.5) intermediates TOTAL regardless of hot hubs — a naive
    neighbor self-join explodes quadratically on the highest-degree
    node (the curse the paper names). Every triangle is counted
    exactly once: its three vertices have a unique (degree, id) order
    u ≺ v ≺ w, and only u generates the wedge.

    Input: undirected unique edges (one row per edge, any endpoint
    order, no self-loops). Output: one row (n_edges, n_wedges,
    n_triangles) — wedge count exposes the orientation bound the plan
    is designed around. Integer-only math: value-hash oracle-able.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    ranked = e.join(du, "u").join(dv, "v")
    ou = F.struct(F.col("deg_u").alias("d"), F.col("u").alias("n"))
    ov = F.struct(F.col("deg_v").alias("d"), F.col("v").alias("n"))
    oriented = ranked.select(
        F.when(ou < ov, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(ou < ov, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(ou < ov, ov).otherwise(ou).alias("ord_b"),
    ).transform(barrier)  # consumed by the wedge self-join
    # (both sides) AND the closing semi-join; blocks GC-freed
    w1 = oriented.select("a", F.col("b").alias("x"), F.col("ord_b").alias("ord_x"))
    w2 = oriented.select("a", F.col("b").alias("y"), F.col("ord_b").alias("ord_y"))
    wedges = w1.join(w2, "a").filter(F.col("ord_x") < F.col("ord_y"))
    # oriented edges are unique, so the left join marks without fanout
    closing = oriented.select(
        F.col("a").alias("x"), F.col("b").alias("y"), F.lit(1).alias("__hit")
    )
    marked = wedges.join(closing, ["x", "y"], "left")
    wedge_stats = marked.agg(
        F.count(F.lit(1)).alias("n_wedges"),
        F.count("__hit").alias("n_triangles"),
    )
    edge_stats = oriented.agg(F.count(F.lit(1)).alias("n_edges"))
    # 1-row x 1-row scalar gate (the engine's established pattern)
    return edge_stats.crossJoin(wedge_stats).select(
        "n_edges", "n_wedges", "n_triangles"
    )
