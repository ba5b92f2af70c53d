"""Streaming semantics tests: true multi-micro-batch execution,
per-batch heavy-hitter reports (Part_B.py:112-114), nested-NDJSON
stream shape (FIXTURES.md A4), and watermarked windows."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from introduction_in_big_data_spark.sources.tables import load_table
from introduction_in_big_data_spark.streaming import stream as st


def test_stream_runs_in_multiple_batches(spark, sf_dir):
    """5 staged files × maxFilesPerTrigger=1 → 5 micro-batches; the
    cumulative count at the end equals the batch count."""
    reports, start = st.per_batch_topk(
        st.events_stream(spark, sf_dir, n_files=5), ["event_type"], k=5
    )
    q = start()
    q.awaitTermination()
    assert len(reports) == 5, f"expected 5 micro-batches, got {len(reports)}"
    # per-batch totals must be non-decreasing (cumulative state)
    totals = [sum(cnt for *_, cnt in rows) for _, rows in reports]
    assert totals == sorted(totals)
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .orderBy(F.desc("count"), F.asc("event_type"))
        .limit(5)
        .collect()
    )
    assert [tuple(r) for r in exact] == list(reports[-1][1])


POSTS_SCHEMA = T.StructType(
    [
        T.StructField("user", T.StructType([T.StructField("id", T.LongType())])),
        T.StructField(
            "entities",
            T.StructType(
                [
                    T.StructField(
                        "hashtags",
                        T.ArrayType(
                            T.StructType([T.StructField("text", T.StringType())])
                        ),
                    )
                ]
            ),
        ),
    ]
)


def test_ndjson_nested_stream(spark, tmp_path):
    """S4/F10-F12 — the reference's Twitter-post stream (Part_B.py:102,
    105-106): nested user.id access + hashtag explode over an NDJSON
    directory queue, counted cumulatively across micro-batches."""
    posts = [
        {"user": {"id": 1}, "entities": {"hashtags": [{"text": "spark"}, {"text": "big"}]}},
        {"user": {"id": 2}, "entities": {"hashtags": [{"text": "spark"}]}},
        {"user": {"id": 1}, "entities": {"hashtags": []}},
        {"user": {"id": 3}, "entities": {"hashtags": [{"text": "data"}, {"text": "spark"}]}},
    ]
    d = tmp_path / "posts"
    d.mkdir()
    for i, chunk in enumerate([posts[:2], posts[2:]]):
        with open(d / f"part-{i}.json", "w") as f:
            for p in chunk:
                f.write(json.dumps(p) + "\n")

    s = st.ndjson_stream(spark, str(d), POSTS_SCHEMA, max_files_per_trigger=1)
    tags = s.select(F.explode(F.col("entities.hashtags")).alias("h")).select(
        F.col("h.text").alias("tag")
    )
    tag_counts = st.run_to_memory(st.cumulative_counts(tags, ["tag"]), "complete")
    assert {(r["tag"], r["cnt"]) for r in tag_counts.collect()} == {
        ("spark", 3),
        ("big", 1),
        ("data", 1),
    }
    users = st.run_to_memory(
        st.cumulative_counts(s.select(F.col("user.id").alias("uid")), ["uid"]),
        "complete",
    )
    assert {(r["uid"], r["cnt"]) for r in users.collect()} == {(1, 2), (2, 1), (3, 1)}


def test_watermarked_window_append(spark, sf_dir):
    """Watermark + tumbling window in append mode: only windows sealed
    by the watermark emit; every emitted window must agree with the
    batch computation."""
    s = st.events_stream(spark, sf_dir, n_files=5)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").cast("long").alias("window_epoch"), "cnt")
    )
    emitted = {
        r["window_epoch"]: r["cnt"] for r in st.run_to_memory(agg, "append").collect()
    }
    batch = {
        r["window_epoch"]: r["cnt"]
        for r in (
            load_table(spark, sf_dir, "events")
            .groupBy(
                F.expr("(unix_timestamp(ts) div 3600) * 3600")
                .cast("long")
                .alias("window_epoch")
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
        ).collect()
    }
    assert emitted, "append mode should emit sealed windows"
    # append-mode semantics: a sealed window never over-counts, and rows
    # arriving later than the watermark are dropped — so emitted ≤ batch,
    # with equality for almost all windows on near-time-ordered input
    assert set(emitted) <= set(batch)
    assert all(cnt <= batch[epoch] for epoch, cnt in emitted.items())
    exact_matches = sum(1 for e, c in emitted.items() if batch[e] == c)
    assert exact_matches >= 0.75 * len(emitted), (exact_matches, len(emitted))


def test_stage_dir_idempotent(spark, sf_dir):
    d1 = st.stage_events_dir(spark, sf_dir, 5)
    mtime = os.path.getmtime(os.path.join(d1, "_SUCCESS"))
    d2 = st.stage_events_dir(spark, sf_dir, 5)
    assert d1 == d2
    assert os.path.getmtime(os.path.join(d2, "_SUCCESS")) == mtime


def test_streaming_session_window(spark, sf_dir):
    """session_window(ts, gap) — the streaming twin of the batch
    sessionize operator. Complete-mode session counts per user must
    total the event count."""
    s = st.events_stream(spark, sf_dir, n_files=5)
    agg = (
        s.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = st.run_to_memory(agg, "complete")
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "events").count()
    # session count per user must match the batch sessionize operator
    from introduction_in_big_data_spark.operators import timeseries

    batch_sessions = (
        timeseries.sessionize(load_table(spark, sf_dir, "events"), "user_id", "ts", 1800)
        .groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n_sessions"))
    )
    stream_sessions = out.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions"))
    assert sorted(map(tuple, batch_sessions.collect())) == sorted(
        map(tuple, stream_sessions.collect())
    )


def test_stream_stream_interval_join(spark, sf_dir):
    """Stream-stream inner join with watermarks + event-time bound:
    (click, purchase) pairs of the same user with the click in the hour
    before the purchase. With a watermark far larger than the data span
    nothing is dropped, so the result must equal the batch interval
    join over the same rows."""
    clicks = (
        st.events_stream(spark, sf_dir, n_files=5)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "60 days")
    )
    purchases = (
        st.events_stream(spark, sf_dir, n_files=5)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "60 days")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("click_id", "purchase_id")
    streamed = {(r["click_id"], r["purchase_id"]) for r in st.run_to_memory(joined, "append").collect()}

    e = load_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
    )
    batch = {
        (r["click_id"], r["purchase_id"])
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        ).select("click_id", "purchase_id").collect()
    }
    assert streamed == batch
    assert batch, "fixture should produce at least one pair"


def test_checkpoint_resume_exactly_once(spark, sf_dir, tmp_path):
    """Fault-tolerance witness (§2.9): run the file queue with a
    checkpoint, STOP after the first 3 files, add the remaining 2, and
    restart with the SAME checkpoint. The resumed query must (a) skip
    the already-committed files — measured via numInputRows — and
    (b) land on exactly the batch answer: state restored + no double
    counting = exactly-once end to end."""
    import glob as _glob
    import shutil

    staged = st.stage_events_dir(spark, sf_dir, 5)
    files = sorted(_glob.glob(os.path.join(staged, "part-*")))
    assert len(files) == 5
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(staged).schema

    def run(name: str):
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        agg = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows_in = sum(
            int(p["numInputRows"]) for p in (json.loads(pp.json) for pp in q.recentProgress)
        )
        return rows_in

    for f in files[:3]:
        shutil.copy(f, src / os.path.basename(f))
    phase1_rows = run("ckpt_phase1")

    for f in files[3:]:
        shutil.copy(f, src / os.path.basename(f))
    phase2_rows = run("ckpt_phase2")

    first3 = spark.read.parquet(*files[:3]).count()
    last2 = spark.read.parquet(*files[3:]).count()
    assert phase1_rows == first3
    # the resumed run read ONLY the two new files
    assert phase2_rows == last2, (phase2_rows, last2)

    got = {
        r["event_type"]: r["cnt"] for r in spark.table("ckpt_phase2").collect()
    }
    expected = {
        r["event_type"]: r["cnt"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected


def test_rocksdb_state_store_parity(spark, sf_dir):
    """The 100 TB streaming-state path: the default HDFS-backed state
    store keeps every key in executor heap; RocksDB (ships with Spark)
    spills state to local disk and is the provider a large stateful
    job actually deploys with. Run the cumulative aggregate under
    RocksDB and assert exact parity with the batch answer — the
    provider is a drop-in conf, not a semantics change."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        s = st.events_stream(spark, sf_dir, n_files=5)
        got = {
            r["event_type"]: r["cnt"]
            for r in st.run_to_memory(
                st.cumulative_counts(s, ["event_type"]), "complete"
            ).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    expected = {
        r["event_type"]: r["cnt"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected


def test_stream_stream_left_outer_join_flush(spark, sf_dir):
    """Watermarked stream-stream LEFT OUTER join: unmatched left rows
    emit null-padded ONLY once the watermark proves no match can
    arrive — on a bounded run that requires the flush-sentinel final
    batch (events_stream_with_flush). Exact parity with the batch
    left join, including the null rows; sentinels (negative user ids)
    never leak into the result."""
    s = st.events_stream_with_flush(spark, sf_dir, n_files=5)
    views = (
        s.filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "3650 days")
    )
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "3650 days")
    )
    cond = F.expr(
        "user_id = c_user AND click_ts >= view_ts "
        "AND click_ts <= view_ts + interval 30 minutes"
    )
    joined = views.join(clicks, cond, "left_outer").select(
        "user_id", "view_ts", "click_ts"
    )
    drained = st.run_to_memory(joined, "append", state_partitions=4)
    assert drained.filter(F.col("user_id") < 0).count() == 0
    streamed = {
        (r["user_id"], r["view_ts"], r["click_ts"])
        for r in drained.collect()
    }

    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    batch = {
        (r["user_id"], r["view_ts"], r["click_ts"])
        for r in v.join(c, cond, "left_outer")
        .select("user_id", "view_ts", "click_ts")
        .collect()
    }
    assert streamed == batch
    assert any(ct is None for _u, _vt, ct in batch), (
        "fixture should contain at least one view without a click"
    )
