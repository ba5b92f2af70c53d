"""Shared staging for the CDF/CDC demonstration queries: ONE
orders-derived Delta table (CDF on, integer cents) pushed through the
same UPDATE WHERE → MERGE → DELETE WHERE chain, plus the matching
oracle CTE block. Four registered queries consume it
(delta_cdf_mv_maintenance, delta_cdc_replica_state,
stream_delta_cdf_feed, stream_cdf_standing_aggregate) — one
definition keeps their Spark plans and oracle SQL from silently
drifting apart (review finding, r5 s3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import t

#: the DML chain replayed in SQL: base (exact integer cents — floor()
#: per the repo's double→BIGINT cast contract), u (UPDATE), src
#: (MERGE source), m (post-merge), f (post-DELETE final state)
CDF_DML_CTES = """
        WITH base AS (
            SELECT o_orderkey, o_orderpriority,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS o_cents
            FROM orders
        ),
        u AS (
            SELECT o_orderkey, o_orderpriority,
                   CASE WHEN o_orderpriority = '1-URGENT'
                        THEN o_cents * 2 ELSE o_cents END AS o_cents
            FROM base
        ),
        src AS (
            SELECT o_orderkey,
                   '0-MERGED' AS o_orderpriority,
                   o_cents * 3 AS o_cents
            FROM base WHERE o_orderkey % 97 = 0
            UNION ALL
            SELECT o_orderkey + 10000000, '9-NEW', o_cents
            FROM base WHERE o_orderkey % 101 = 0
        ),
        m AS (
            SELECT o_orderkey, o_orderpriority, o_cents FROM u
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
            UNION ALL
            SELECT * FROM src
        ),
        f AS (SELECT * FROM m WHERE o_orderpriority <> '3-MEDIUM')
"""


def cents_base(spark, sf_dir):
    """(o_orderkey, o_orderpriority, o_cents) — the `base` CTE's
    Spark twin."""
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_totalprice") * 100 + 0.5).cast("long").alias("o_cents"),
    )


def stage_cdf_dml_table(spark, sf_dir, prefix: str):
    """Stage the CDF-enabled table and run the UPDATE → MERGE →
    DELETE chain. Returns (reader, v0, base_df) where v0 is the
    creation version (time-travelable for initial materializations)."""
    import tempfile

    from ..sources.deltalog import DeltaLogReader, create_minimal_table

    base = cents_base(spark, sf_dir)
    path = tempfile.mkdtemp(prefix=prefix) + "/t"
    create_minimal_table(
        spark, path, base.repartitionByRange(8, "o_orderkey"),
        stats=True, cdf=True,
    )
    reader = DeltaLogReader(spark, path)
    v0 = reader.latest_version()
    reader.update_where(
        [("o_orderpriority", "=", "1-URGENT")], {"o_cents": "o_cents * 2"}
    )
    source = (
        base.filter("o_orderkey % 97 = 0")
        .select(
            "o_orderkey",
            F.lit("0-MERGED").alias("o_orderpriority"),
            (F.col("o_cents") * 3).alias("o_cents"),
        )
        .unionByName(
            base.filter("o_orderkey % 101 = 0").select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                F.lit("9-NEW").alias("o_orderpriority"),
                "o_cents",
            )
        )
    )
    reader.merge(source, "o_orderkey")
    reader.delete_where([("o_orderpriority", "=", "3-MEDIUM")])
    return reader, v0, base
