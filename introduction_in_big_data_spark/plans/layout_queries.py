"""Data-layout queries: Z-order clustering keys and their pruning
payoff (operators/layout.py, functions/zorder.py). No reference
analog — layout management is a pure scale capability — but the
Morton arithmetic is plain integer shifts both engines run
identically, so the key computation itself is hash-checked."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.zorder import z_interleave16_sql, zorder_key2
from .registry import register, t

# grid reduction for the two event dimensions: user id and epoch-hour,
# both masked to 16 bits (the z-key contract). Epoch arithmetic, never
# calendar rendering — session-timezone-free.
_EVENTS_ZKEY_SQL = z_interleave16_sql(
    "user_id", "(CAST(epoch(ts) AS BIGINT) // 3600)"
)


@register(
    "events_zorder_buckets",
    oracle=f"""
        SELECT CAST({_EVENTS_ZKEY_SQL} >> 18 AS BIGINT) AS zbucket,
               count(*) AS cnt,
               CAST(min(user_id) AS BIGINT) AS min_user,
               CAST(max(user_id) AS BIGINT) AS max_user,
               CAST(min(CAST(epoch(ts) AS BIGINT) // 3600) AS BIGINT) AS min_hour,
               CAST(max(CAST(epoch(ts) AS BIGINT) // 3600) AS BIGINT) AS max_hour
        FROM events
        GROUP BY zbucket
        ORDER BY cnt DESC, zbucket
        LIMIT 20
    """,
    tags=("layout", "zorder"),
)
def events_zorder_buckets(spark, sf_dir):
    """Morton-key bucketing of events on (user_id, epoch-hour): the
    top z-curve quads by population, with each quad's bounding box in
    BOTH dimensions. The per-bucket min/max columns are the pruning
    story made visible — a quad's narrow user AND hour ranges are
    exactly the parquet footer stats a Z-ordered file layout gives a
    reader to skip with (operators/layout.write_zordered writes such a
    layout; tests/test_layout.py measures the skip fraction). The
    interleave is four mask-shift rounds of codegen integer arithmetic
    — bit-identical in the DuckDB oracle, so the whole key construction
    is hash-checked, not trusted."""
    e = t(spark, sf_dir, "events")
    hour = F.expr("unix_timestamp(ts) div 3600")
    zkey = zorder_key2(F.col("user_id"), hour)
    return (
        e.select(
            F.shiftright(zkey, 18).cast("long").alias("zbucket"),
            "user_id",
            hour.alias("__hour"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("user_id").cast("long").alias("min_user"),
            F.max("user_id").cast("long").alias("max_user"),
            F.min("__hour").alias("min_hour"),
            F.max("__hour").alias("max_hour"),
        )
        .orderBy(F.desc("cnt"), F.asc("zbucket"))
        .limit(20)
    )
