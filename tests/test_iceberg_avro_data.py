"""AVRO data files in Iceberg tables (round 11, VERDICT r10 item 3):
`file_format: AVRO`, content=0 is a first-class data format per the
spec (common in Flink-written and migrated warehouses). The scan takes
its schema from the TABLE metadata and resolves current field ids
against the writer schema's `field-id` properties — renames project
correctly out of old files — with row positions synthesized from
record order so position deletes and DVs apply unchanged. ORC data
files are a DECLARED boundary (refusal pinned below)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.functions import avrocodec
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


def test_avro_data_read_basic(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark), data_format="AVRO")
    # staged as avro container files, not parquet
    files = os.listdir(os.path.join(path, "data"))
    assert files and all(f.endswith(".avro") for f in files)
    got = {x.k: (x.n_chars, x.score, x.tag) for x in
           IcebergTableReader(spark, path).read().collect()}
    assert len(got) == 120
    assert got[7] == (14, 10.5, "d7")


def test_avro_data_position_deletes_apply(spark, tmp_path):
    """delete_where hit-detects over the Avro scan (positions = record
    order) and the snapshot read applies the resulting position-delete
    file to the untouched Avro data files."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark), data_format="AVRO")
    IcebergTableReader(spark, path).delete_where([("k", "<", 20)])
    r = IcebergTableReader(spark, path)
    got = sorted(x.k for x in r.read().collect())
    assert got == list(range(20, 120))
    # data files are still the original avro containers
    data = os.listdir(os.path.join(path, "data"))
    assert [f for f in data if f.endswith(".avro")]


def test_avro_data_projection_after_rename(spark, tmp_path):
    """Field-id projection out of Avro writer schemas: after a rename
    the CURRENT column name resolves to the file's OLD field name by
    id — both on plain reads and on the DML hit-detection scan (the
    _dml_scan shape VERDICT r10 asked to pin)."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark), data_format="AVRO")
    IcebergTableReader(spark, path).update_schema(
        renames={"n_chars": "char_count"}
    )
    got = {x.k: x.char_count for x in
           IcebergTableReader(spark, path).read().collect()}
    assert got[9] == 18 and len(got) == 120
    # DML keyed on the renamed column must see real values, not nulls
    IcebergTableReader(spark, path).update_where(
        [("char_count", "=", 18)], {"char_count": "char_count + 1000"}
    )
    got2 = {x.k: x.char_count for x in
            IcebergTableReader(spark, path).read().collect()}
    assert got2[9] == 1018 and got2[10] == 20
    # the update appended a parquet image next to avro survivors: the
    # mixed-format snapshot unions both scan branches
    data = os.listdir(os.path.join(path, "data"))
    assert [f for f in data if f.endswith(".avro")]
    assert [f for f in data if f.endswith(".parquet")]


def test_avro_data_initial_default_fill(spark, tmp_path):
    """A column added with an initial-default renders the DEFAULT from
    Avro files written before it existed (same JVM-side fill as the
    parquet path)."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 30), data_format="AVRO")
    IcebergTableReader(spark, path).update_schema(
        adds=[("grade", "string", "ungraded")]
    )
    rows = IcebergTableReader(spark, path).read().collect()
    assert len(rows) == 30
    assert {x.grade for x in rows} == {"ungraded"}


def test_avro_data_name_fallback_without_field_ids(spark, tmp_path):
    """Files whose writer schema carries no field-id properties (the
    pre-field-id Avro shape) fall back to name matching."""
    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark, 40), data_format="AVRO", field_ids=False
    )
    got = {x.k: x.tag for x in
           IcebergTableReader(spark, path).read().collect()}
    assert len(got) == 40 and got[3] == "d3"


def test_avro_data_name_mapping_resolves_renames(spark, tmp_path):
    """With `schema.name-mapping.default` set, field-id-less Avro
    files project by the MAPPING (the spec's resolution rule for
    migrated files) — a renamed column resolves out of the old file
    names, like the parquet mapped branch."""
    import json

    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, _df(spark, 30), data_format="AVRO",
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
    got = {x.k: x.label for x in
           IcebergTableReader(spark, path).read().collect()}
    assert len(got) == 30 and got[3] == "d3"


def test_avro_data_timestamptz_decodes_utc(spark, tmp_path):
    """Iceberg stores timestamptz as UTC micros on the Avro wire; the
    kernel must emit tz-AWARE datetimes so the value is
    session-timezone independent (the driver sim's #1 killer)."""
    import json

    path = str(tmp_path / "t")
    base = spark.range(0, 10, 1, 1).select(
        F.col("id").alias("k"),
        (F.col("id") * 1_000_000 + 1_700_000_000_000_000).alias("ts"),
    )
    create_minimal_table(spark, path, base, data_format="AVRO")
    # doctor the table schema: ts is a timestamptz (the long micros on
    # the wire are exactly what an external Avro writer stores)
    meta_dir = os.path.join(path, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        v = fh.read().strip()
    mf = os.path.join(meta_dir, f"v{v}.metadata.json")
    with open(mf) as fh:
        meta = json.load(fh)
    for s in meta.get("schemas", [meta.get("schema")]):
        for f in s["fields"]:
            if f["name"] == "ts":
                f["type"] = "timestamptz"
    with open(mf, "w") as fh:
        json.dump(meta, fh)
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        epochs = {}
        for tz in ("UTC", "Asia/Kathmandu"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = IcebergTableReader(spark, path).read()
            epochs[tz] = {
                x.k: x.e
                for x in df.select(
                    "k", F.unix_timestamp("ts").alias("e")
                ).collect()
            }
        assert epochs["UTC"] == epochs["Asia/Kathmandu"]
        assert epochs["UTC"][0] == 1_700_000_000
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_avro_equality_deletes_apply_sequence_gated(spark, tmp_path):
    """AVRO equality-delete files (field-id-projected, decoded through
    the in-repo codec) apply with the spec's strictly-smaller-sequence
    gate — including after a rename, where the delete column resolves
    by id — over an all-Avro table (Avro data + Avro deletes)."""
    from introduction_in_big_data_spark.sources.iceberg import (
        add_equality_deletes,
        append_data_snapshot,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 60), data_format="AVRO")
    add_equality_deletes(
        spark, path, [(5,), (7,), (999,)], ["k"], sequence=1,
        file_format="AVRO",
    )
    got = sorted(x.k for x in IcebergTableReader(spark, path).read().collect())
    assert got == [k for k in range(60) if k not in (5, 7)]
    # re-insert k=5 at a LATER sequence: it must survive the delete
    append_data_snapshot(
        spark,
        path,
        spark.createDataFrame(
            [(5, 10, 7.5, "d5b")], "k long, n_chars long, score double, tag string"
        ),
        sequence=3,
    )
    got2 = sorted(x.k for x in IcebergTableReader(spark, path).read().collect())
    assert got2.count(5) == 1 and 7 not in got2
    # rename: the avro delete file still resolves its column by id
    IcebergTableReader(spark, path).update_schema(renames={"k": "key"})
    add_equality_deletes(
        spark, path, [(11,)], ["key"], sequence=5, file_format="AVRO"
    )
    got3 = sorted(x.key for x in IcebergTableReader(spark, path).read().collect())
    assert 11 not in got3 and got3.count(5) == 1


def test_avro_data_row_lineage_derivation(spark, tmp_path):
    """Row lineage over Avro data files: _row_id derives as the
    file's first_row_id + record position (the Avro scan's synthetic
    __pos), and a DV update preserves ids through a parquet image —
    the mixed-format lineage read."""
    from introduction_in_big_data_spark.sources.iceberg import (
        enable_row_lineage,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 40, 1, 1).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_minimal_table(spark, path, base, data_format="AVRO")
    enable_row_lineage(spark, path)
    got = {
        x.k: x._row_id
        for x in IcebergTableReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert len(got) == 40 and len(set(got.values())) == 40
    IcebergTableReader(spark, path).update_where_dv(
        [("k", "=", 7)], {"v": "777.0"}
    )
    got2 = {
        x.k: (x.v, x._row_id)
        for x in IcebergTableReader(spark, path)
        .read(with_row_ids=True)
        .collect()
    }
    assert got2[7] == (777.0, got[7]), "updated row keeps its id"
    assert got2[8] == (8.0, got[8])


def test_avro_data_changelog_and_incremental(spark, tmp_path):
    """changelog()/incremental() route through the same format-split
    scan: an Avro table's delete commit renders its matched rows."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 50), data_format="AVRO")
    t0 = IcebergTableReader(spark, path)
    m = t0.metadata()
    s0 = m["current-snapshot-id"]
    t0.delete_where([("k", "<", 5)])
    t1 = IcebergTableReader(spark, path)
    s1 = t1.metadata()["current-snapshot-id"]
    ch = t1.changelog(s0, s1).collect()
    dels = sorted(x.k for x in ch if x["_change_type"] == "delete")
    assert dels == [0, 1, 2, 3, 4]


def test_compact_migrates_avro_table_to_parquet(spark, tmp_path):
    """compact() over an Avro-data table reads through the format
    split and REWRITES as parquet — maintenance doubles as a
    format-migration path (deletes folded, values identical)."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 80), data_format="AVRO")
    IcebergTableReader(spark, path).delete_where([("k", ">=", 70)])
    IcebergTableReader(spark, path).compact()
    t2 = IcebergTableReader(spark, path)
    m = t2.metadata()
    snap = next(
        s for s in m["snapshots"]
        if s["snapshot-id"] == m["current-snapshot-id"]
    )
    data, pos, eq = t2._live_files(snap)
    assert not pos and not eq
    assert all(p.endswith(".parquet") for p, _ in data), "all parquet now"
    got = {x.k: x.tag for x in t2.read().collect()}
    assert sorted(got) == list(range(70)) and got[3] == "d3"


def test_unknown_data_format_refuses_as_declared_boundary(spark, tmp_path):
    """Round 12 reworks the r11 ORC refusal into a read path
    (test_iceberg_orc_data.py); the remaining boundary — any OTHER
    data format — still refuses loudly, naming the supported set."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 10))
    # doctor the manifest: flip every data entry's format to RCFile
    meta_dir = os.path.join(path, "metadata")
    manifest = next(
        os.path.join(meta_dir, f)
        for f in os.listdir(meta_dir)
        if f.endswith("-m0.avro")
    )
    schema, entries = avrocodec.read_container(manifest)
    for e in entries:
        e["data_file"]["file_format"] = "RCFILE"
    os.remove(manifest)
    avrocodec.write_container(manifest, schema, entries)
    with pytest.raises(
        UnsupportedIcebergFeature, match="RCFILE|only PARQUET"
    ):
        IcebergTableReader(spark, path).read().collect()


def test_avro_eq_delete_driver_decode_cap_distributes_backlog(
    spark, tmp_path, monkeypatch
):
    """The per-snapshot driver-decode cap on AVRO equality-delete
    bytes (VERDICT r11 item 2): an un-compacted CDC backlog over the
    cap decodes DISTRIBUTED (one mapInPandas task per delete file,
    _eq_delete_avro_scan) instead of on the driver — same answer,
    sequence gate included, and the driver decoder is provably never
    called; under the cap the driver path (no job) still runs."""
    from introduction_in_big_data_spark.sources import iceberg as ice
    from introduction_in_big_data_spark.sources.iceberg import (
        add_equality_deletes,
        append_data_snapshot,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark, 40), data_format="AVRO")
    add_equality_deletes(
        spark, path, [(5,), (7,), (11,)], ["k"], sequence=1,
        file_format="AVRO",
    )
    # re-insert k=5 at a later sequence: must survive on BOTH paths
    append_data_snapshot(
        spark,
        path,
        spark.createDataFrame(
            [(5, 10, 7.5, "d5b")],
            "k long, n_chars long, score double, tag string",
        ),
        sequence=3,
    )
    expect = sorted(
        [k for k in range(40) if k not in (5, 7, 11)] + [5]
    )
    # default (64 MiB) cap: driver path, deletes applied
    got = sorted(
        x.k for x in IcebergTableReader(spark, path).read().collect()
    )
    assert got == expect
    conf = "spark.ibd.iceberg.eqDeleteAvroDriverCapBytes"
    try:
        spark.conf.set(conf, "16")  # far below any real container file
        def _boom(self, *a, **k):  # driver decode must NOT run
            raise AssertionError(
                "driver-side eq-delete decode ran above the cap"
            )

        monkeypatch.setattr(
            ice.IcebergTableReader, "_eq_delete_avro_rows", _boom
        )
        got2 = sorted(
            x.k
            for x in IcebergTableReader(spark, path).read().collect()
        )
        assert got2 == expect
    finally:
        spark.conf.unset(conf)
