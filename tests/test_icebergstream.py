"""Streaming source over externally-written Iceberg tables
(sources/icebergstream.py): snapshot-ordinal offsets, append-diff
batches, loud refusal of delete/REPLACE snapshots."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.iceberg import (
    IcebergTableReader,
    append_data_snapshot,
    create_minimal_table,
)
from introduction_in_big_data_spark.sources.icebergstream import (
    register_iceberg_stream,
)
from introduction_in_big_data_spark.streaming import stream as st


def _df(spark, lo=0, hi=300):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _load(spark, path, **opts):
    register_iceberg_stream(spark)
    r = spark.readStream.format("iceberg_stream").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_full_replay_matches_batch(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 0, 200))
    append_data_snapshot(spark, path, _df(spark, 200, 260), sequence=1)
    append_data_snapshot(spark, path, _df(spark, 260, 300), sequence=2)
    s = _load(spark, path, startingSnapshotIndex="0")
    out = st.run_to_memory(
        s.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        ),
        "complete",
        state_partitions=2,
    )
    got = out.collect()[0]
    batch = IcebergTableReader(spark, path).read().agg(
        F.count(F.lit(1)), F.sum("v")
    ).collect()[0]
    assert (got.n, got.sv) == (batch[0], batch[1]) == (300, 448500)


def test_offset_contract_default_tails_new_snapshots(spark, tmp_path):
    """The offset contract directly: the default initial offset is
    the CURRENT snapshot ordinal (tail-only), ranges render exactly
    the in-between snapshots' appended files, empty ranges yield no
    partitions."""
    from introduction_in_big_data_spark.sources.icebergstream import (
        IcebergStreamReader,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 0, 200))
    t = IcebergTableReader(spark, path)
    sid1 = t.metadata()["current-snapshot-id"]
    r = IcebergStreamReader({"path": path})
    assert r.initialOffset() == {"sid": sid1}  # history skipped
    append_data_snapshot(spark, path, _df(spark, 200, 230), sequence=1)
    sid2 = IcebergTableReader(spark, path).metadata()[
        "current-snapshot-id"
    ]
    assert r.latestOffset() == {"sid": sid2}
    parts = r.partitions({"sid": sid1}, {"sid": sid2})
    rows = [row for p in parts for row in r.read(p)]
    assert sorted(k for k, _v in rows) == list(range(200, 230))
    assert r.partitions({"sid": sid2}, {"sid": sid2}) == []
    # an expired checkpointed id refuses instead of mis-aligning
    import pytest as _pt

    with _pt.raises(ValueError, match="no longer"):
        r.partitions({"sid": 999999}, {"sid": sid2})


def test_delete_snapshot_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark), bounds=True)
    IcebergTableReader(spark, path).delete_where([("k", ">=", 290)])
    s = _load(spark, path, startingSnapshotIndex="0")
    with pytest.raises(Exception, match="delete files|append-only"):
        st.run_to_memory(s.groupBy().count(), "complete", state_partitions=2)


def test_replace_snapshot_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark))
    IcebergTableReader(spark, path).compact(target_bytes=1 << 20)
    s = _load(spark, path, startingSnapshotIndex="0")
    with pytest.raises(Exception, match="removes|append-only"):
        st.run_to_memory(s.groupBy().count(), "complete", state_partitions=2)


def test_streams_avro_data_files(spark, tmp_path):
    """AVRO data files stream (round 11): the appended Avro container
    decodes worker-side through the by-value codec, field-id-projected
    driver-side — including after a rename — and mixes with parquet
    appends in one replay."""
    import json as _json
    import os as _os

    from introduction_in_big_data_spark.functions import avrocodec

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 0, 100), data_format="AVRO")
    IcebergTableReader(spark, path).update_schema(renames={"v": "val"})
    # append one MORE avro file (id-projected across the rename) and
    # one parquet file: a mixed-format replay
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": ["null", "long"], "field-id": 1},
            {"name": "v", "type": ["null", "long"], "field-id": 2},
        ],
    }
    p2 = _os.path.join(path, "data", "extra.avro")
    avrocodec.write_container(
        p2, schema, [{"k": k, "v": k * 10} for k in range(100, 160)]
    )
    _register_existing_file(spark, path, p2, "AVRO", 60, sequence=1)
    append_data_snapshot(
        spark, path,
        spark.range(160, 200).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("val")
        ),
        sequence=2,
    )
    s = _load(spark, path, startingSnapshotIndex="0")
    out = st.run_to_memory(
        s.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("val").alias("sv")
        ),
        "complete",
        state_partitions=2,
    )
    got = out.collect()[0]
    batch = IcebergTableReader(spark, path).read().agg(
        F.count(F.lit(1)), F.sum("val")
    ).collect()[0]
    assert (got.n, got.sv) == (batch[0], batch[1]) == (200, 199000)


def _register_existing_file(spark, path, p, fmt, n_rows, sequence):
    """Commit an already-written data file as an append snapshot."""
    import os as _os
    import uuid as _uuid

    from introduction_in_big_data_spark.functions import avrocodec
    from introduction_in_big_data_spark.sources.iceberg import (
        _MANIFEST_V2_SCHEMA,
        _commit_snapshot,
        _pad_nullable_fields,
    )

    meta_dir = _os.path.join(path, "metadata")
    manifest = _os.path.join(meta_dir, f"{_uuid.uuid4().hex}-m0.avro")
    entry = {
        "status": 1,
        "snapshot_id": None,
        "sequence_number": int(sequence),
        "data_file": {
            "content": 0,
            "file_path": f"file://{p}",
            "file_format": fmt,
            "record_count": n_rows,
            "file_size_in_bytes": _os.path.getsize(p),
        },
    }
    df_schema = next(
        f for f in _MANIFEST_V2_SCHEMA["fields"] if f["name"] == "data_file"
    )["type"]
    entry["data_file"] = _pad_nullable_fields(df_schema, entry["data_file"])
    avrocodec.write_container(manifest, _MANIFEST_V2_SCHEMA, [entry])
    _commit_snapshot(spark, path, [(manifest, 0)], "append")
