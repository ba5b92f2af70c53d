"""applyInPandasWithState custom stateful operator tests."""

from __future__ import annotations

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
