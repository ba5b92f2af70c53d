"""Skew-join demonstration at bench scale (VERDICT r1 item 7).

A deliberately pathological key distribution — ~90% of lineitem rows
remapped onto ONE join key — joined against orders as a large-large
shuffle join, in two registered flavors:

- `skew_join_unsalted`: plain sort-merge join on the hot key (merge
  hint so the dim is never broadcast — at 100 TB the build side
  wouldn't fit an executor). One shuffle partition receives ~90% of
  the probe side; the bench line makes the stall measurable.
- `skew_join_salted`: operators/skew.salted_join — probe rows scatter
  uniformly over `salt` replicas of the build side, so the hot key's
  rows land on `salt` partitions instead of one.

Both produce identical results (same DuckDB oracle) — only the
physical distribution differs. tests/test_skew_ivf_streamsketch.py
additionally asserts the partition-size ratio: the salted layout's
largest post-shuffle partition is a fraction of the unsalted one's.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import skew
from .registry import register, t

SKEW_SALT = 8

# ~90% of lineitem rows collapse onto order key 1; the rest keep their
# real key. Mirrored exactly in the oracle SQL.
_SKEW_KEY = "CASE WHEN l_orderkey % 10 < 9 THEN 1 ELSE l_orderkey END"

_SKEW_ORACLE = f"""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM (SELECT {_SKEW_KEY} AS k, l_quantity FROM lineitem) l
    JOIN orders ON o_orderkey = l.k
    GROUP BY o_orderpriority
"""


def _skewed_probe(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").select(
        F.expr(_SKEW_KEY).alias("k"), "l_quantity"
    )


def _build(spark, sf_dir):
    return t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )


def _aggregate(joined):
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
    )


@register(
    "skew_join_unsalted",
    oracle=_SKEW_ORACLE,
    tags=("skew", "join"),
    bench=True,
)
def skew_join_unsalted(spark, sf_dir):
    """The baseline: shuffle join straight on the hot key. The merge
    hint keeps it a sort-merge join (no broadcast escape hatch), so
    one task owns ~90% of the probe rows unless AQE's skew splitting
    rescues it — exactly the stall the salted twin removes."""
    probe = _skewed_probe(spark, sf_dir)
    build = _build(spark, sf_dir).hint("merge")
    return _aggregate(probe.join(build, "k"))


@register(
    "skew_join_salted",
    oracle=_SKEW_ORACLE,
    tags=("skew", "join", "scale"),
    bench=True,
)
def skew_join_salted(spark, sf_dir):
    """The fix: salted_join scatters the hot key over SKEW_SALT build
    replicas. Identical rows/hashes to the unsalted form — the oracle
    proves it — with the hot partition split SKEW_SALT ways."""
    probe = _skewed_probe(spark, sf_dir)
    build = _build(spark, sf_dir)
    return _aggregate(skew.salted_join(probe, build, "k", salt=SKEW_SALT))
