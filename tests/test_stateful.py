"""applyInPandasWithState custom stateful operator tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.tables import load_table
from introduction_in_big_data_spark.streaming import stream as st
from introduction_in_big_data_spark.streaming.stateful import running_user_stats


def test_running_user_stats_matches_batch(spark, sf_dir):
    s = st.events_stream(spark, sf_dir, n_files=5)
    out = st.run_to_memory(running_user_stats(s), "update")
    # update mode emits one row per key per batch; the final (max-n) row
    # per key is the cumulative state at stream end
    final = (
        out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy(F.desc("n"))
            ),
        )
        .filter("rn = 1")
        .select("user_id", "n", "total", "mean")
    )
    got = {r["user_id"]: (r["n"], round(r["total"], 6)) for r in final.collect()}
    batch = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total")
    )
    want = {r["user_id"]: (r["n"], r["total"]) for r in batch.collect()}
    assert got == want
    # state evolved across batches: some key must have emitted >1 row
    assert out.count() > len(want)


def test_transform_with_state_matches_batch(spark, sf_dir):
    # transformWithStateInPandas spawns a protobuf-speaking driver
    # worker; the container has no google.protobuf, so this runs only
    # where the dependency exists (the operator itself builds its plan
    # regardless - same gating policy as the JDBC writer / multimodal
    # decode kernels).
    pytest.importorskip("google.protobuf")
    from introduction_in_big_data_spark.streaming.stateful import (
        running_user_stats_tws,
    )
    from pyspark.sql.window import Window

    s = st.events_stream(spark, sf_dir, n_files=5)
    out = st.run_to_memory(running_user_stats_tws(s), "update")
    final = (
        out.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("user_id").orderBy(F.desc("n"))),
        )
        .filter("rn = 1")
        .select("user_id", "n", "total")
    )
    got = {r["user_id"]: (r["n"], round(r["total"], 6)) for r in final.collect()}
    batch = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total")
    )
    want = {r["user_id"]: (r["n"], r["total"]) for r in batch.collect()}
    assert got == want
    assert out.count() > len(want)  # state really evolved across batches


def test_transform_with_state_builds_plan(spark, sf_dir):
    """The TWS operator must at least construct its streaming plan in
    this container (execution needs protobuf; see skip above)."""
    from introduction_in_big_data_spark.streaming.stateful import (
        running_user_stats_tws,
    )

    s = st.events_stream(spark, sf_dir, n_files=2)
    out = running_user_stats_tws(s)
    assert out.isStreaming
    assert set(out.columns) == {"user_id", "n", "total", "mean"}
