"""Iceberg ORC data files (round 12, VERDICT r11 item 4 — previously a
pinned refusal): `file_format: ORC`, content=0, the
Hive-migrated-warehouse shape. Field ids resolve from the spec's
`iceberg.id` ORC column attributes (pyarrow surfaces them as Arrow
field metadata), name-mapping then plain-name fallback for
attribute-less files. HYBRID scan: plain reads ride Spark's NATIVE
JVM ORC reader (_orc_native_scan — codegen, vectorized, stripe
splits); when row positions are needed (deletes/DVs/lineage) the
pyarrow per-file kernel synthesizes them from record order, because
Spark's _metadata.row_index is parquet-only."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.iceberg import (
    IcebergTableReader,
    UnsupportedIcebergFeature,
    create_minimal_table,
)


def _df(spark, n=120):
    return spark.range(0, n, 1, 3).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("n_chars"),
        (F.col("id") * 1.5).alias("score"),
        F.concat(F.lit("d"), F.col("id")).alias("tag"),
    )


def test_orc_data_read_basic(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark), data_format="ORC")
    files = os.listdir(os.path.join(path, "data"))
    assert files and all(f.endswith(".orc") for f in files)
    # the staged files carry the spec's iceberg.id column attributes
    from introduction_in_big_data_spark.sources.orc_io import (
        read_orc_schema,
    )

    sch = read_orc_schema(os.path.join(path, "data", sorted(files)[0]))
    ids = {f.name: (f.metadata or {}).get(b"iceberg.id") for f in sch}
    assert ids == {
        "k": b"1", "n_chars": b"2", "score": b"3", "tag": b"4"
    }
    got = {
        x.k: (x.n_chars, x.score, x.tag)
        for x in IcebergTableReader(spark, path).read().collect()
    }
    assert len(got) == 120 and got[7] == (14, 10.5, "d7")


def test_orc_rename_resolves_by_attribute_id(spark, tmp_path):
    """After a rename the current column name is ABSENT from every
    ORC file; projection must resolve through the file's iceberg.id
    attributes."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 30), data_format="ORC")
    IcebergTableReader(spark, path).update_schema(
        renames={"n_chars": "char_count"}
    )
    got = {
        x.k: x.char_count
        for x in IcebergTableReader(spark, path).read().collect()
    }
    assert got[11] == 22 and len(got) == 30


def test_orc_name_mapping_fallback_for_attributeless_files(
    spark, tmp_path
):
    """field_ids=False stages ORC files with NO iceberg.id attributes
    (the Hive-migrated shape); `schema.name-mapping.default` resolves
    them, including across a subsequent rename."""
    path = str(tmp_path / "t")
    create_minimal_table(
        spark,
        path,
        _df(spark, 25),
        data_format="ORC",
        field_ids=False,
        properties={
            "schema.name-mapping.default": json.dumps(
                [
                    {"field-id": 1, "names": ["k"]},
                    {"field-id": 2, "names": ["n_chars"]},
                    {"field-id": 3, "names": ["score"]},
                    {"field-id": 4, "names": ["tag"]},
                ]
            )
        },
    )
    IcebergTableReader(spark, path).update_schema(
        renames={"tag": "label"}
    )
    got = {
        x.k: x.label
        for x in IcebergTableReader(spark, path).read().collect()
    }
    assert got[9] == "d9" and len(got) == 25


def test_orc_dml_delete_update_mixed_formats(spark, tmp_path):
    """delete_where hit-detects over the ORC scan's synthesized
    positions; update_where appends its image as PARQUET, so the
    final snapshot unions both format branches."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 50), data_format="ORC")
    IcebergTableReader(spark, path).delete_where([("k", "<", 10)])
    IcebergTableReader(spark, path).update_where(
        [("k", ">=", 40)], {"n_chars": "n_chars + 1000"}
    )
    got = {
        x.k: x.n_chars
        for x in IcebergTableReader(spark, path).read().collect()
    }
    assert sorted(got) == list(range(10, 50))
    assert got[45] == 90 + 1000 and got[20] == 40


def test_orc_compact_migrates_to_parquet(spark, tmp_path):
    """compact() over an ORC-data table reads through the format split
    and rewrites as parquet — the same maintenance-as-migration path
    the Avro leg documents."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 80), data_format="ORC")
    IcebergTableReader(spark, path).delete_where([("k", ">=", 70)])
    IcebergTableReader(spark, path).compact()
    t2 = IcebergTableReader(spark, path)
    m = t2.metadata()
    snap = next(
        s
        for s in m["snapshots"]
        if s["snapshot-id"] == m["current-snapshot-id"]
    )
    data, pos, eq = t2._live_files(snap)
    assert not pos and not eq
    assert all(p.endswith(".parquet") for p, _ in data)
    got = {x.k: x.tag for x in t2.read().collect()}
    assert sorted(got) == list(range(70)) and got[3] == "d3"


def test_orc_streaming_source(spark, tmp_path):
    """The iceberg_stream source replays ORC data files: sources
    resolve driver-side by iceberg.id (across a rename), workers read
    via pyarrow.orc with column pruning."""
    from introduction_in_big_data_spark.sources.icebergstream import (
        register_iceberg_stream,
    )
    from introduction_in_big_data_spark.streaming import stream as st

    path = str(tmp_path / "t")
    base = spark.range(0, 90, 1, 2).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    create_minimal_table(spark, path, base, data_format="ORC")
    IcebergTableReader(spark, path).update_schema(renames={"v": "val"})
    register_iceberg_stream(spark)
    s = (
        spark.readStream.format("iceberg_stream")
        .option("path", path)
        .option("startingSnapshotIndex", "0")
        .load()
    )
    out = st.run_to_memory(
        s.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("val").alias("sv")
        ),
        "complete",
        state_partitions=2,
    )
    got = out.collect()[0]
    assert (got.n, got.sv) == (90, sum(k * 10 for k in range(90)))


def test_orc_equality_delete_files_refuse(spark, tmp_path):
    """The remaining ORC boundary: DELETE files in ORC refuse loudly
    (data files read; the delete-side formats stay PARQUET/AVRO)."""
    from introduction_in_big_data_spark.sources.iceberg import (
        add_equality_deletes,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 20), data_format="ORC")
    add_equality_deletes(
        spark, path, [(5,)], ["k"], sequence=1, file_format="ORC"
    )
    with pytest.raises(
        UnsupportedIcebergFeature, match="equality-delete file format"
    ):
        IcebergTableReader(spark, path).read().collect()


def test_orc_plain_read_takes_native_jvm_branch(spark, tmp_path):
    """The dominant 100TB case — a plain ORC table scan with no
    row-level deletes — must run on Spark's NATIVE JVM ORC reader
    (whole-stage codegen, vectorized, stripe splits), NOT the pyarrow
    position kernel; the kernel exists only because _metadata.
    row_index is parquet-only. A rename keeps the read on the native
    branch (physical-schema + alias projection)."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 40), data_format="ORC")
    IcebergTableReader(spark, path).update_schema(
        renames={"n_chars": "char_count"}
    )
    df = IcebergTableReader(spark, path).read()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    assert "orc" in plan.lower()
    got = {x.k: x.char_count for x in df.collect()}
    assert got[13] == 26 and len(got) == 40
    # ...and once row-level deletes exist, the position kernel engages
    IcebergTableReader(spark, path).delete_where([("k", "<", 5)])
    df2 = IcebergTableReader(spark, path).read()
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan2
    assert sorted(x.k for x in df2.collect()) == list(range(5, 40))


def test_orc_bounds_staging_enables_file_skipping(spark, tmp_path):
    """ORC staging records manifest bounds (the stats scan rides
    Spark's native ORC reader — round 12), so ORC tables get the same
    file-skipping tier as parquet: a selective predicate read prunes
    files whose [min, max] provably exclude it, and the answer
    matches the unpruned read."""
    path = str(tmp_path / "t")
    base = spark.range(0, 9000, 1, 6).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("m")
    ).sortWithinPartitions("k")
    create_minimal_table(
        spark, path, base.repartitionByRange(6, "k"),
        data_format="ORC", bounds=True,
    )
    t = IcebergTableReader(spark, path)
    got = sorted(
        x.k for x in t.read(predicates=[("k", "<", 100)]).collect()
    )
    assert got == list(range(100))
    assert t.last_scan["skipped_files"] > 0
