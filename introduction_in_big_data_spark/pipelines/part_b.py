"""Part_B.py reproduced end-to-end: the four stream counters over an
NDJSON directory of Twitter-shaped posts (FIXTURES.md A4), as bounded
Structured Streaming runs.

Reference counters (Part_B.py:90-182) → engine form:
  WithFrequenciesCounter  → cumulative counts + per-batch top-5
  WithMinCountCounter     → relational CMS folded across batches
  WithHLLUniqueCounter    → approx_count_distinct (intended HLL
                            semantics — the reference's HLL is buggy)
  WithSetsUniqueCounter   → streaming dropDuplicates distinct count
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..streaming import stream as st
from ..streaming.sketch_stream import run_streaming_cms

POSTS_SCHEMA = T.StructType(
    [
        T.StructField("user", T.StructType([T.StructField("id", T.LongType())])),
        T.StructField(
            "entities",
            T.StructType(
                [
                    T.StructField(
                        "hashtags",
                        T.ArrayType(T.StructType([T.StructField("text", T.StringType())])),
                    )
                ]
            ),
        ),
    ]
)

MAX_COUNTS_LIMIT = 5  # Part_B.py:10


def _users(posts: DataFrame) -> DataFrame:
    return posts.select(F.col("user.id").alias("user_id"))


def _tags(posts: DataFrame) -> DataFrame:
    return posts.select(F.explode("entities.hashtags").alias("h")).select(
        F.col("h.text").alias("tag")
    )


def run_stream_counters(
    spark: SparkSession, posts_dir: str, max_files_per_trigger: int = 1
) -> dict:
    """Drain the posts directory as a micro-batched stream four ways.
    Returns final frequency/distinct frames plus the per-batch top-5
    report list (the reference's per-batch prints)."""
    def stream():
        return st.ndjson_stream(spark, posts_dir, POSTS_SCHEMA, max_files_per_trigger)

    user_freq = st.run_to_memory(
        st.cumulative_counts(_users(stream()), ["user_id"]), "complete"
    )
    tag_freq = st.run_to_memory(st.cumulative_counts(_tags(stream()), ["tag"]), "complete")

    reports, start = st.per_batch_topk(_tags(stream()), ["tag"], MAX_COUNTS_LIMIT)
    q = start()
    q.awaitTermination()

    cms_users = run_streaming_cms(_users(stream()), "user_id")

    distinct_users = st.run_to_memory(
        st.streaming_distinct_count(_users(stream()), "user_id"), "complete"
    )
    approx_users = st.run_to_memory(
        _users(stream()).agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_distinct")
        ),
        "complete",
    )

    return {
        "user_freq": user_freq,
        "tag_freq": tag_freq,
        "per_batch_top5": reports,
        "cms_users": cms_users,
        "distinct_users": distinct_users,
        "approx_distinct_users": approx_users,
    }
