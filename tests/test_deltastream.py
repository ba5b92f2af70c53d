"""Streaming FROM an externally-written Delta table
(sources/deltastream.py — Spark 4 Python DataSource, offsets = Delta
versions, one partition per added file, pyarrow worker reads with
typed partition-value reconstruction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.deltalog import (
    commit_append,
    commit_remove_partition,
    create_minimal_table,
)
from introduction_in_big_data_spark.sources.deltastream import (
    register_delta_stream,
)
from introduction_in_big_data_spark.streaming import stream as st


@pytest.fixture()
def df(spark):
    return spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("p")
    )


def _load(spark, path, **opts):
    register_delta_stream(spark)
    r = spark.readStream.format("delta_stream").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_full_replay_matches_batch(spark, tmp_path, df):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, df.filter("k < 100"))
    commit_append(spark, path, df.filter("k >= 100 AND k < 200"))
    commit_append(spark, path, df.filter("k >= 200"))
    s = _load(spark, path, startingVersion="0")
    agg = s.groupBy("p").agg(
        F.count(F.lit(1)).alias("n"), F.sum("k").alias("ksum")
    )
    out = st.run_to_memory(agg, "complete", state_partitions=4)
    got = {(r.p, r.n, r.ksum) for r in out.collect()}
    want = {
        (r.p, r.n, r.ksum)
        for r in df.groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("ksum"))
        .collect()
    }
    assert got == want


def test_partition_values_reconstruct_typed(spark, tmp_path, df):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, df.filter("k < 150"), partition_by=["p"])
    commit_append(spark, path, df.filter("k >= 150"), partition_by=["p"])
    s = _load(spark, path, startingVersion="0")
    out = st.run_to_memory(s.groupBy("p").count(), "complete", state_partitions=4)
    assert sorted((r.p, r["count"]) for r in out.collect()) == [
        (0, 100),
        (1, 100),
        (2, 100),
    ]
    # the partition column is a real int on the stream schema
    assert dict(s.dtypes)["p"] == "int"


def test_default_starts_after_current_snapshot(spark, tmp_path, df):
    """Without startingVersion the initial offset resolves to the
    LATEST version at query start (new-commits-only tailing — Delta's
    default), so a bounded run over a quiescent table emits nothing;
    replaying the same table WITH startingVersion=0 emits everything."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, df.filter("k < 100"))
    commit_append(spark, path, df.filter("k >= 100 AND k < 130"))
    s = _load(spark, path)
    out = st.run_to_memory(s.groupBy().count(), "complete", state_partitions=2)
    assert [r["count"] for r in out.collect()] == [0]
    s2 = _load(spark, path, startingVersion="0")
    out2 = st.run_to_memory(s2.groupBy().count(), "complete", state_partitions=2)
    assert [r["count"] for r in out2.collect()] == [130]


def test_data_removal_refuses_without_options(spark, tmp_path, df):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, df, partition_by=["p"])
    commit_remove_partition(spark, path, "p", "1")
    s = _load(spark, path, startingVersion="0")
    with pytest.raises(Exception, match="ignoreDeletes|removes data"):
        st.run_to_memory(s.groupBy().count(), "complete", state_partitions=2)


def test_ignore_deletes_skips_delete_only_commits(spark, tmp_path, df):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, df, partition_by=["p"])
    commit_remove_partition(spark, path, "p", "1")
    commit_append(spark, path, df.filter("p = 0").select(
        (F.col("k") + 1000).alias("k"), "p"), partition_by=["p"])
    s = _load(spark, path, startingVersion="0", ignoreDeletes="true")
    out = st.run_to_memory(s.groupBy().count(), "complete", state_partitions=2)
    # create (300) + append (100); the delete-only commit emits nothing
    assert [r["count"] for r in out.collect()] == [400]


def test_column_mapped_table_streams(spark, tmp_path, df):
    """Round 8: column-mapped tables STREAM (workers scan physical
    column names; partitionValues resolve by physical key) — the old
    reader-v2 refusal is gone. Unknown v3 features still refuse."""
    import json as _json
    import os as _os

    from introduction_in_big_data_spark.sources.deltalog import (
        commit_append,
        create_column_mapped_table,
    )

    path = str(tmp_path / "t")
    create_column_mapped_table(spark, path, df)
    register_delta_stream(spark)
    q = (
        spark.readStream.format("delta_stream")
        .option("path", path)
        .option("startingVersion", "0")
        .load()
        .writeStream.format("memory")
        .queryName("cm_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("cm_stream")
    assert sorted(got.columns) == sorted(df.columns)
    assert got.count() == df.count()
    # appended physical-named files tail into the stream too
    phys = {
        f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
        for a in (
            _json.loads(ln)
            for ln in open(
                _os.path.join(path, "_delta_log", f"{0:020d}.json")
            )
            if ln.strip()
        )
        if "metaData" in a
        for f in _json.loads(a["metaData"]["schemaString"])["fields"]
    }
    from pyspark.sql import functions as F

    batch = df.limit(3).select(
        *[F.col(c).alias(phys[c]) for c in df.columns]
    )
    commit_append(spark, path, batch)
    q2 = (
        spark.readStream.format("delta_stream")
        .option("path", path)
        .option("startingVersion", "0")
        .load()
        .writeStream.format("memory")
        .queryName("cm_stream2")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.table("cm_stream2").count() == df.count() + 3

    # a v3 table needing features beyond columnMapping/deletionVectors
    # still refuses
    path2 = str(tmp_path / "t2")
    create_column_mapped_table(spark, path2, df)
    c0 = _os.path.join(path2, "_delta_log", f"{0:020d}.json")
    acts = [_json.loads(ln) for ln in open(c0) if ln.strip()]
    for a in acts:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["columnMapping", "v2Checkpoint"],
                "writerFeatures": ["columnMapping", "v2Checkpoint"],
            }
    with open(c0, "w") as fh:
        for a in acts:
            fh.write(_json.dumps(a) + "\n")
    with pytest.raises(Exception, match="v2Checkpoint"):
        (
            spark.readStream.format("delta_stream")
            .option("path", path2)
            .load()
        )


# -- readChangeFeed=true ------------------------------------------------------


def test_cdf_stream_matches_batch_changes(spark, tmp_path, df):
    from introduction_in_big_data_spark.sources.deltalog import (
        DeltaLogReader,
    )

    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path,
        df.select("k", "p", (F.col("k") * 10).alias("v"))
        .repartitionByRange(4, "k"),
        stats=True, cdf=True,
    )
    r = DeltaLogReader(spark, path)
    v0 = r.latest_version()
    r.update_where([("k", "<", 5)], {"v": "v + 1"})
    r.merge(
        spark.createDataFrame(
            [(7, 1, -7), (900, 0, -9)], "k long, p int, v long"
        ),
        "k",
    )
    r.delete_where([("k", ">=", 290), ("k", "<", 900)])
    v1 = r.latest_version()
    s = _load(
        spark, path, readChangeFeed="true", startingVersion=str(v0 + 1)
    )
    streamed = st.run_to_memory(
        s.groupBy("_change_type", "_commit_version").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        ),
        "complete",
        state_partitions=2,
    )
    batch = (
        r.changes(v0, v1)
        .groupBy("_change_type", "_commit_version")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    key = lambda x: (x._change_type, x._commit_version)  # noqa: E731
    got = sorted(
        (key(x), x.n, x.sv) for x in streamed.collect()
    )
    want = sorted((key(x), x.n, x.sv) for x in batch.collect())
    assert got == want and len(got) >= 4


def test_cdf_stream_renders_appends_and_refuses_cdfless_rewrites(
    spark, tmp_path, df
):
    from introduction_in_big_data_spark.sources.deltalog import (
        DeltaLogReader,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, df, cdf=False)  # CDF off
    commit_append(spark, path, df.select((F.col("k") + 1000).alias("k"), "p"))
    s = _load(spark, path, readChangeFeed="true", startingVersion="1")
    out = st.run_to_memory(
        s.groupBy("_change_type").count(), "complete", state_partitions=2
    )
    assert [(r._change_type, r["count"]) for r in out.collect()] == [
        ("insert", 300)
    ]
    # a rewriting commit without cdc actions fails the CDF stream
    DeltaLogReader(spark, path).update_where([("k", "<", 3)], {"k": "k + 0"})
    s2 = _load(spark, path, readChangeFeed="true", startingVersion="2")
    with pytest.raises(Exception, match="without cdc"):
        st.run_to_memory(
            s2.groupBy().count(), "complete", state_partitions=2
        )


def test_cdf_stream_renders_deletion_vector_commits(spark, tmp_path, df):
    """Round 8: the CDF stream renders DELETION-VECTOR commits — the
    bitmap diff decodes driver-side in partitions(), workers receive
    position lists. Stream == batch changes(), pinned per commit."""
    from introduction_in_big_data_spark.sources.deltalog import (
        DeltaLogReader,
        commit_add_with_dv,
        create_minimal_table,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, df.repartition(1), stats=True
    )
    r = DeltaLogReader(spark, path)
    v1 = r.delete_where_dv([("k", "<", 3)])
    v2 = r.delete_where_dv([("k", ">=", 2), ("k", "<", 6)])  # overlap
    born = spark.range(2000, 2010, 1, 1).select(
        F.col("id").alias("k"), F.lit(-1.0).alias("v")
    )
    v3 = commit_add_with_dv(spark, path, born, [0, 1])
    register_delta_stream(spark)
    q = (
        spark.readStream.format("delta_stream")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load()
        .writeStream.format("memory")
        .queryName("dv_cdf_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (x.k, x._change_type, x._commit_version)
        for x in spark.table("dv_cdf_stream").collect()
    }
    expected = (
        {(k, "delete", v1) for k in range(3)}
        | {(k, "delete", v2) for k in range(3, 6)}  # overlap nets out
        | {(k, "insert", v3) for k in range(2002, 2010)}  # complement
    )
    assert got == expected
    # parity with batch changes()
    batch = {
        (x.k, x["_change_type"], x["_commit_version"])
        for x in DeltaLogReader(spark, path).changes(0, v3).collect()
    }
    assert got == batch


def test_delta_append_sink_exactly_once(spark, tmp_path, df):
    """Streaming INTO an external Delta table (round 8): foreachBatch
    appends stamp SetTransaction (app_id, batch_id) — a replayed
    batch is a no-op, so restart-replay delivers exactly-once; an
    independent app_id keeps its own watermark."""
    from introduction_in_big_data_spark.sources.deltalog import (
        DeltaLogReader,
        delta_append_sink,
        txn_version,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, df.filter("k < 10"))
    sink = delta_append_sink(path, "app-a")
    b1 = df.filter("k >= 10 AND k < 40")
    sink(b1, 0)
    sink(df.filter("k >= 40 AND k < 60"), 1)
    assert DeltaLogReader(spark, path).read().count() == 60
    # foreachBatch replay of batch 1 after a restart: NO-OP
    sink(df.filter("k >= 40 AND k < 60"), 1)
    assert DeltaLogReader(spark, path).read().count() == 60
    assert txn_version(path, "app-a") == 1
    # stale batch 0 replay: also a no-op
    sink(b1, 0)
    assert DeltaLogReader(spark, path).read().count() == 60
    # a different app appends independently
    delta_append_sink(path, "app-b")(df.filter("k >= 60 AND k < 65"), 0)
    assert DeltaLogReader(spark, path).read().count() == 65
    assert txn_version(path, "app-b") == 0
    assert txn_version(path, "nope") == -1


@pytest.mark.parametrize("v2", [False, True])
def test_txn_watermark_survives_checkpoint_and_vacuum(spark, tmp_path, df, v2):
    """ADVICE r8 (medium): checkpoints must carry the latest txn per
    appId — after write_checkpoint + vacuuming the pre-checkpoint JSON
    commits, the SetTransaction watermark must NOT reset to -1, else a
    replayed foreachBatch micro-batch re-appends (duplicates)."""
    import os

    from introduction_in_big_data_spark.sources.deltalog import (
        DeltaLogReader,
        delta_append_sink,
        txn_version,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, df.filter("k < 10"))
    sink = delta_append_sink(path, "app-a")
    sink(df.filter("k >= 10 AND k < 40"), 0)
    sink(df.filter("k >= 40 AND k < 60"), 1)
    delta_append_sink(path, "app-b")(df.filter("k >= 60 AND k < 65"), 0)

    t = DeltaLogReader(spark, path)
    cp_v = t.write_checkpoint(v2=v2)
    log = os.path.join(path, "_delta_log")
    for v in range(cp_v + 1):
        os.unlink(os.path.join(log, f"{v:020d}.json"))

    # watermark survives the checkpoint handoff per appId
    assert txn_version(path, "app-a") == 1
    assert txn_version(path, "app-b") == 0
    assert txn_version(path, "nope") == -1
    # the real invariant: a replayed micro-batch is STILL a no-op
    sink(df.filter("k >= 40 AND k < 60"), 1)
    assert DeltaLogReader(spark, path).read().count() == 65
    # and the next epoch appends normally, advancing the watermark
    sink(df.filter("k >= 65 AND k < 70"), 2)
    assert DeltaLogReader(spark, path).read().count() == 70
    assert txn_version(path, "app-a") == 2
    # a SECOND checkpoint re-compacts the watermarks (json tail +
    # prior checkpoint both feed _replay's txn accumulation)
    t2 = DeltaLogReader(spark, path)
    cp2 = t2.write_checkpoint(v2=v2)
    for v in range(cp_v + 1, cp2 + 1):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    assert txn_version(path, "app-a") == 2
    sink(df.filter("k >= 65 AND k < 70"), 2)  # replay: still a no-op
    assert DeltaLogReader(spark, path).read().count() == 70


def test_column_mapped_nested_columns_stream(spark, tmp_path):
    """Round 9 (VERDICT r8 item 7): NESTED columns under column
    mapping stream — the worker reads the physical struct members by
    their file-side names and rebuilds logical rows in logical member
    order (lists of structs included), closing the r8 refusal."""
    import json as _json
    import os as _os

    from introduction_in_big_data_spark.sources.deltalog import (
        create_column_mapped_table,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 40).select(
        F.col("id").alias("k"),
        F.struct(
            (F.col("id") * 2).alias("a"), F.concat(F.lit("s"), F.col("id")).alias("b")
        ).alias("info"),
        F.array(
            F.struct((F.col("id") * 10).alias("a")),
            F.struct((F.col("id") * 10 + 1).alias("a")),
        ).alias("arr"),
    )
    create_column_mapped_table(spark, path, base)
    # forge MEMBER renames: logical alpha/beta map to file-side a/b
    c0 = _os.path.join(path, "_delta_log", f"{0:020d}.json")
    acts = [_json.loads(ln) for ln in open(c0) if ln.strip()]
    for act in acts:
        if "metaData" not in act:
            continue
        sch = _json.loads(act["metaData"]["schemaString"])
        for f in sch["fields"]:
            if f["name"] == "info":
                for i, mf in enumerate(f["type"]["fields"]):
                    mf["metadata"] = {
                        "delta.columnMapping.id": 100 + i,
                        "delta.columnMapping.physicalName": mf["name"],
                    }
                    mf["name"] = {"a": "alpha", "b": "beta"}[mf["name"]]
            if f["name"] == "arr":
                el = f["type"]["elementType"]
                el["fields"][0]["metadata"] = {
                    "delta.columnMapping.id": 200,
                    "delta.columnMapping.physicalName": "a",
                }
                el["fields"][0]["name"] = "alpha"
        act["metaData"]["schemaString"] = _json.dumps(sch)
    with open(c0, "w") as fh:
        for act in acts:
            fh.write(_json.dumps(act) + "\n")

    s = _load(spark, path, startingVersion="0")
    out = st.run_to_memory(s, "append", state_partitions=2)
    rows = {r.k: r for r in out.collect()}
    assert len(rows) == 40
    assert rows[7].info.alpha == 14 and rows[7].info.beta == "s7"
    assert [e.alpha for e in rows[7].arr] == [70, 71]


def test_type_widened_table_streams(spark, tmp_path):
    """Round 9: typeWidening tables stream — the worker's Python-object
    rows satisfy the declared wide schema with no upcast step (ints
    are ints, floats are floats)."""
    import json as _json
    import os as _os

    path = str(tmp_path / "t")
    create_minimal_table(
        spark,
        path,
        spark.range(0, 25).selectExpr(
            "CAST(id AS INT) AS k", "CAST(id AS FLOAT) AS w"
        ),
    )
    c0 = _os.path.join(path, "_delta_log", f"{0:020d}.json")
    acts = [_json.loads(ln) for ln in open(c0) if ln.strip()]
    for a in acts:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["typeWidening"],
                "writerFeatures": ["typeWidening"],
            }
        if "metaData" in a:
            sch = _json.loads(a["metaData"]["schemaString"])
            sch["fields"][0]["type"] = "long"
            sch["fields"][1]["type"] = "double"
            a["metaData"]["schemaString"] = _json.dumps(sch)
    with open(c0, "w") as fh:
        for a in acts:
            fh.write(_json.dumps(a) + "\n")
    s = _load(spark, path, startingVersion="0")
    out = st.run_to_memory(s, "append", state_partitions=2)
    assert dict(out.dtypes) == {"k": "bigint", "w": "double"}
    rows = {r.k: r.w for r in out.collect()}
    assert rows[7] == 7.0 and len(rows) == 25


def test_txn_watermark_survives_old_format_checkpoint(spark, tmp_path, df):
    """Code review r9: a checkpoint written WITHOUT txn rows (the
    pre-round-9 schema) must not shadow surviving JSON commits — the
    watermark keeps reading from the log tail, and replayed batches
    stay no-ops."""
    import os

    import pyarrow.parquet as pq

    from introduction_in_big_data_spark.sources.deltalog import (
        DeltaLogReader,
        delta_append_sink,
        txn_version,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, df.filter("k < 10"))
    sink = delta_append_sink(path, "app-a")
    sink(df.filter("k >= 10 AND k < 40"), 0)
    t = DeltaLogReader(spark, path)
    cp_v = t.write_checkpoint()
    # forge the OLD checkpoint format: rewrite without the txn column
    cp_file = os.path.join(
        path, "_delta_log", f"{cp_v:020d}.checkpoint.parquet"
    )
    tbl = pq.read_table(cp_file)
    assert "txn" in tbl.schema.names
    pq.write_table(tbl.drop_columns(["txn", "domainMetadata"]), cp_file)
    # JSON commits survive (no vacuum): the watermark must NOT reset
    assert txn_version(path, "app-a") == 0
    sink(df.filter("k >= 10 AND k < 40"), 0)  # replay: still a no-op
    assert DeltaLogReader(spark, path).read().count() == 40
