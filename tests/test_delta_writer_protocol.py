"""Writer-protocol gating on externally-written Delta tables: DML
refuses loudly when the table's protocol obliges a writer to enforce
something this engine does not (appendOnly, invariants, CHECK
constraints, generated/identity columns, unknown writer features) —
corrupting an external table being the one unforgivable interop
failure."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.deltalog import (
    ConstraintViolation,
    DeltaLogReader,
    UnsupportedDeltaFeature,
    create_minimal_table,
)


def _df(spark):
    return spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )


def _patch_commit0(path, protocol=None, configuration=None, field_md=None):
    """Rewrite commit 0 with a modified protocol / metaData."""
    c0 = os.path.join(path, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(ln) for ln in open(c0) if ln.strip()]
    for a in actions:
        if protocol and "protocol" in a:
            a["protocol"] = protocol
        if "metaData" in a:
            if configuration is not None:
                a["metaData"]["configuration"] = configuration
            if field_md is not None:
                sch = json.loads(a["metaData"]["schemaString"])
                sch["fields"][0]["metadata"] = field_md
                a["metaData"]["schemaString"] = json.dumps(sch)
    with open(c0, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def test_append_only_blocks_data_removal_not_optimize(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark).repartition(3))
    _patch_commit0(path, configuration={"delta.appendOnly": "true"})
    r = DeltaLogReader(spark, path)
    for op in (
        lambda: r.delete_where([("k", "<", 5)]),
        lambda: r.delete_where_dv([("k", "<", 5)]),
        lambda: r.update_where([("k", "<", 5)], {"v": "0.0"}),
        lambda: r.update_where_dv([("k", "<", 5)], {"v": "0.0"}),
        lambda: r.merge(
            spark.createDataFrame([(1, -1.0)], "k long, v double"), "k"
        ),
    ):
        with pytest.raises(UnsupportedDeltaFeature, match="appendOnly"):
            op()
    # OPTIMIZE only removes dataChange=false references: legal
    v = r.optimize(target_bytes=1 << 30)
    assert DeltaLogReader(spark, path).read().count() == 50
    assert v >= 0


def test_check_constraints_enforced_on_write(spark, tmp_path):
    """Round 8 (VERDICT r7 item 7): CHECK constraints are ENFORCED on
    row-producing writes instead of refusing the table — conforming
    batches commit, violating ones abort with nothing published."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark), stats=True)
    _patch_commit0(
        path, configuration={"delta.constraints.positive_v": "v >= 0"}
    )
    r = DeltaLogReader(spark, path)
    # non-row-producing DML no longer refuses
    v = r.delete_where([("k", "<", 5)])
    assert r.read().count() == 45
    # conforming merge commits
    r.merge(
        spark.createDataFrame([(100, 7.0)], "k long, v double"), "k"
    )
    assert r.read().count() == 46
    # violating merge aborts — including the FALSE-or-NULL rule
    # (delta-spark treats a NULL evaluation as a violation)
    for bad in ((101, -1.0), (101, None)):
        with pytest.raises(ConstraintViolation, match="positive_v"):
            r.merge(
                spark.createDataFrame([bad], "k long, v double"), "k"
            )
    assert DeltaLogReader(spark, path).latest_version() == v + 1
    # violating UPDATE aborts before anything publishes
    with pytest.raises(ConstraintViolation, match="positive_v"):
        r.update_where([("k", "=", 100)], {"v": "-5.0"})
    with pytest.raises(ConstraintViolation, match="positive_v"):
        r.update_where_dv([("k", "=", 100)], {"v": "-5.0"})
    r.update_where([("k", "=", 100)], {"v": "v + 1"})
    got = {x.k: x.v for x in DeltaLogReader(spark, path).read().collect()}
    assert got[100] == 8.0


def test_invariants_enforced_generated_columns_refuse(spark, tmp_path):
    # invariants now ENFORCE (round 8); generated/identity still refuse
    path = str(tmp_path / "t_inv")
    create_minimal_table(spark, path, _df(spark), stats=True)
    _patch_commit0(
        path,
        field_md={
            "delta.invariants": '{"expression":{"expression":"k > 0"}}'
        },
    )
    r = DeltaLogReader(spark, path)
    r.merge(spark.createDataFrame([(7, -1.0)], "k long, v double"), "k")
    with pytest.raises(ConstraintViolation, match="invariant:k"):
        r.merge(
            spark.createDataFrame([(0, 1.0)], "k long, v double"), "k"
        )
    # identity WITHOUT allowExplicitInsert still refuses (the
    # high-water-mark generation protocol is not implemented)
    path = str(tmp_path / "t_identity")
    create_minimal_table(spark, path, _df(spark))
    _patch_commit0(path, field_md={"delta.identity.start": 1})
    with pytest.raises(UnsupportedDeltaFeature, match="identity"):
        DeltaLogReader(spark, path).merge(
            spark.createDataFrame([(1, -1.0)], "k long, v double"), "k"
        )


def test_generated_columns_validated_identity_explicit_ok(
    spark, tmp_path
):
    """Round 8: generated columns VALIDATE on write (whole-row
    sources provide the value, so the obligation is value <=>
    expression); identity columns with allowExplicitInsert=true
    accept provided values."""
    path = str(tmp_path / "t_gen")
    create_minimal_table(spark, path, _df(spark), stats=True)
    # v is generated as k * 1.0 (true for the staged data)
    _patch_commit0(
        path,
        field_md=None,
        configuration=None,
    )
    import json as _json
    import os as _os

    c0 = _os.path.join(path, "_delta_log", f"{0:020d}.json")
    acts = [_json.loads(ln) for ln in open(c0) if ln.strip()]
    for a in acts:
        if "metaData" in a:
            sch = _json.loads(a["metaData"]["schemaString"])
            # fields are (k, v): v generated, k identity-explicit
            sch["fields"][1]["metadata"] = {
                "delta.generationExpression": "CAST(k AS DOUBLE)"
            }
            sch["fields"][0]["metadata"] = {
                "delta.identity.start": 1,
                "delta.identity.allowExplicitInsert": True,
            }
            a["metaData"]["schemaString"] = _json.dumps(sch)
    with open(c0, "w") as fh:
        for a in acts:
            fh.write(_json.dumps(a) + "\n")
    r = DeltaLogReader(spark, path)
    # conforming merge: v == CAST(k AS DOUBLE)
    r.merge(
        spark.createDataFrame([(100, 100.0)], "k long, v double"), "k"
    )
    assert r.read().count() == 51
    # mismatched generated value aborts
    with pytest.raises(ConstraintViolation, match="generated:v"):
        r.merge(
            spark.createDataFrame([(101, 5.0)], "k long, v double"), "k"
        )
    assert DeltaLogReader(spark, path).read().count() == 51


def test_unknown_writer_feature_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark))
    _patch_commit0(
        path,
        protocol={
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["someFutureFeature"],
        },
    )
    r = DeltaLogReader(spark, path)
    with pytest.raises(UnsupportedDeltaFeature, match="someFutureFeature"):
        r.delete_where([("k", "<", 5)])
    # reading stays legal: writer features bind writers, not readers
    assert r.read().count() == 50


def test_row_tracking_feature_listed_but_unused_writes(spark, tmp_path):
    """Round 9: `rowTracking` in writerFeatures WITHOUT
    delta.enableRowTracking is the spec's supported-but-not-enabled
    state — every write stays legal (usage-gating, like the other
    conf-gated features); enabling the conf gates non-id-maintaining
    paths (see test_delta_row_tracking.py)."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark))
    _patch_commit0(
        path,
        protocol={
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["rowTracking", "domainMetadata"],
        },
    )
    r = DeltaLogReader(spark, path)
    r.delete_where([("k", "<", 5)])
    assert DeltaLogReader(spark, path).read().count() == 45


def test_plain_tables_still_write(spark, tmp_path):
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark), stats=True)
    r = DeltaLogReader(spark, path)
    r.delete_where_dv([("k", "<", 5)])
    assert r.read().count() == 45


def test_identity_generation_on_append(spark, tmp_path):
    """Round 9 (VERDICT r8 item 8): appends that OMIT an identity
    column generate values from delta.identity.highWaterMark — two
    appends get disjoint, step-aligned ids, and the advanced mark
    commits atomically with the adds (an updated metaData action in
    the SAME version)."""
    from introduction_in_big_data_spark.sources.deltalog import (
        commit_append,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark))  # fields: k, v
    # k becomes an identity column: start 100, step 10, no explicit
    # inserts — and commit 0's rows already consumed up to 590
    _patch_commit0(
        path,
        field_md={
            "delta.identity.start": 100,
            "delta.identity.step": 10,
            "delta.identity.highWaterMark": 590,
            "delta.identity.allowExplicitInsert": False,
        },
    )
    v1 = commit_append(
        spark,
        path,
        spark.createDataFrame([(1001.0,), (1002.0,), (1003.0,)], "v double"),
    )
    got = {
        x.v: x.k
        for x in DeltaLogReader(spark, path).read().collect()
        if x.v >= 1000.0
    }
    assert sorted(got.values()) == [600, 610, 620]
    # the mark advanced in the same commit
    c1 = os.path.join(path, "_delta_log", f"{v1:020d}.json")
    metas = [
        json.loads(ln)["metaData"]
        for ln in open(c1)
        if ln.strip() and "metaData" in json.loads(ln)
    ]
    assert metas, "the commit must carry the updated metaData"
    md = json.loads(metas[0]["schemaString"])["fields"][0]["metadata"]
    assert md["delta.identity.highWaterMark"] == 620
    # second append continues disjointly from the committed mark
    commit_append(
        spark, path, spark.createDataFrame([(1004.0,), (1005.0,)], "v double")
    )
    all_ids = sorted(
        x.k for x in DeltaLogReader(spark, path).read().collect()
        if x.v >= 1000.0
    )
    assert all_ids == [600, 610, 620, 630, 640]
    # explicit inserts still honor the spec gate
    with pytest.raises(UnsupportedDeltaFeature, match="allowExplicitInsert"):
        commit_append(
            spark,
            path,
            spark.createDataFrame([(999, 9.0)], "k long, v double"),
        )


def test_identity_explicit_insert_allowed_when_configured(spark, tmp_path):
    """allowExplicitInsert=true: whole-row appends pass through
    unchanged AND advance the high-water mark past themselves (code
    review r9: generation must never reissue an explicit value), so
    omission generates from beyond the explicit insert."""
    from introduction_in_big_data_spark.sources.deltalog import (
        commit_append,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark))
    _patch_commit0(
        path,
        field_md={
            "delta.identity.start": 1000,
            "delta.identity.step": 1,
            "delta.identity.allowExplicitInsert": True,
        },
    )
    commit_append(
        spark, path, spark.createDataFrame([(7777, 9.0)], "k long, v double")
    )
    assert (
        DeltaLogReader(spark, path).read().filter("k = 7777").count() == 1
    )
    # omitted column: the explicit 7777 advanced the mark, so the
    # generated value is 7778 — NOT a reissue of anything at/below it
    commit_append(
        spark, path, spark.createDataFrame([(42.0,)], "v double")
    )
    got = {
        x.k
        for x in DeltaLogReader(spark, path)
        .read()
        .filter("v = 42.0 AND k > 100")
        .collect()
    }
    assert got == {7778}


def test_type_widening_reads_and_writes(spark, tmp_path):
    """Round 9: the v3 `typeWidening` feature — the logical schema
    carries the WIDE type, old files keep their narrow physical
    types, and Spark's parquet upcast makes reads exact with no plan
    change; DML rewrites write the wide type. Recorded conversions
    outside the supported set refuse loudly."""
    path = str(tmp_path / "t")
    create_minimal_table(
        spark,
        path,
        spark.range(0, 20).selectExpr(
            "CAST(id AS INT) AS k", "CAST(id AS FLOAT) AS v"
        ),
        stats=True,
    )
    # forge the widened table: int->long, float->double with the
    # spec's typeWidening field metadata + (3,7) feature lists
    c0 = os.path.join(path, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(ln) for ln in open(c0) if ln.strip()]
    for a in acts:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["typeWidening"],
                "writerFeatures": ["typeWidening"],
            }
        if "metaData" in a:
            sch = json.loads(a["metaData"]["schemaString"])
            sch["fields"][0]["type"] = "long"
            sch["fields"][0]["metadata"] = {
                "delta.typeWidening": [
                    {"fromType": "integer", "toType": "long",
                     "tableVersion": 1}
                ]
            }
            sch["fields"][1]["type"] = "double"
            sch["fields"][1]["metadata"] = {
                "delta.typeWidening": [
                    {"fromType": "float", "toType": "double",
                     "tableVersion": 1}
                ]
            }
            a["metaData"]["schemaString"] = json.dumps(sch)
    with open(c0, "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    r = DeltaLogReader(spark, path)
    got = r.read()
    assert [f.dataType.simpleString() for f in got.schema.fields] == [
        "bigint", "double",
    ]
    rows = {x.k: x.v for x in got.collect()}
    assert rows[7] == 7.0 and len(rows) == 20
    # DML writes the wide type; narrow files still read alongside
    r.delete_where([("k", "<", 5)])
    r2 = DeltaLogReader(spark, path)
    assert r2.read().count() == 15
    r2.merge(spark.createDataFrame([(100, 1.5)], "k long, v double"), "k")
    assert DeltaLogReader(spark, path).read().count() == 16

    # an unsupported recorded conversion refuses
    acts = [json.loads(ln) for ln in open(c0) if ln.strip()]
    for a in acts:
        if "metaData" in a:
            sch = json.loads(a["metaData"]["schemaString"])
            sch["fields"][0]["metadata"] = {
                "delta.typeWidening": [
                    {"fromType": "date", "toType": "timestamp_ntz",
                     "tableVersion": 1}
                ]
            }
            a["metaData"]["schemaString"] = json.dumps(sch)
    with open(c0, "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    # the widened history is replayed from commit 0; later commits kept
    # the valid metadata, so re-stage a fresh table for the refusal
    path2 = str(tmp_path / "t2")
    create_minimal_table(
        spark, path2, spark.range(3).selectExpr("CAST(id AS INT) AS k")
    )
    c0b = os.path.join(path2, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(ln) for ln in open(c0b) if ln.strip()]
    for a in acts:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["typeWidening"],
                "writerFeatures": ["typeWidening"],
            }
        if "metaData" in a:
            sch = json.loads(a["metaData"]["schemaString"])
            sch["fields"][0]["type"] = "timestamp_ntz"
            sch["fields"][0]["metadata"] = {
                "delta.typeWidening": [
                    {"fromType": "date", "toType": "timestamp_ntz",
                     "tableVersion": 1}
                ]
            }
            a["metaData"]["schemaString"] = json.dumps(sch)
    with open(c0b, "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(UnsupportedDeltaFeature, match="typeWidening"):
        DeltaLogReader(spark, path2).read()


def test_in_commit_timestamps(spark, tmp_path):
    """Round 9: the `inCommitTimestamp` writer feature — every commit
    this engine publishes on an ICT table leads with a commitInfo
    carrying a monotonically increasing inCommitTimestamp, and
    timestamp time travel prefers it over file mtimes."""
    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark), stats=True)
    _patch_commit0(
        path,
        protocol={
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["inCommitTimestamp"],
        },
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    r = DeltaLogReader(spark, path)
    v1 = r.delete_where([("k", "<", 5)])
    v2 = DeltaLogReader(spark, path).delete_where([("k", "<", 10)])
    icts = {}
    for v in (v1, v2):
        acts = [
            json.loads(ln)
            for ln in open(
                os.path.join(path, "_delta_log", f"{v:020d}.json")
            )
            if ln.strip()
        ]
        assert "commitInfo" in acts[0], "commitInfo must lead"
        icts[v] = acts[0]["commitInfo"]["inCommitTimestamp"]
    assert icts[v2] > icts[v1] > 0
    # time travel pins to the ICT, not the file mtime: an mtime far in
    # the future must not move the answer
    os.utime(
        os.path.join(path, "_delta_log", f"{v1:020d}.json"),
        (2**31, 2**31),
    )
    assert DeltaLogReader(spark, path).version_at(icts[v1]) == v1
    assert DeltaLogReader(spark, path).version_at(icts[v2] + 10) == v2
    with pytest.raises(ValueError):
        DeltaLogReader(spark, path).version_at(100)  # before every ICT


def test_timestamp_ntz_reads_and_dml(spark, tmp_path):
    """Round 9: the `timestampNtz` v3 feature — NTZ columns round-trip
    natively (wall time, session-TZ independent), stats serialize, and
    DML writes NTZ parquet back."""
    path = str(tmp_path / "t")
    base = spark.sql(
        "SELECT id AS k, "
        "TIMESTAMP_NTZ '2024-03-01 10:30:00' + make_interval(0,0,0,0,0,0,id)"
        " AS ts FROM range(0, 20)"
    )
    create_minimal_table(spark, path, base, stats=True)
    _patch_commit0(
        path,
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["timestampNtz"],
            "writerFeatures": ["timestampNtz"],
        },
    )
    r = DeltaLogReader(spark, path)
    got = r.read()
    assert dict(got.dtypes)["ts"] == "timestamp_ntz"
    assert got.count() == 20
    import datetime as dt

    r.delete_where([("k", "<", 5)])
    r2 = DeltaLogReader(spark, path)
    rows = {x.k: x.ts for x in r2.read().collect()}
    assert rows[7] == dt.datetime(2024, 3, 1, 10, 30, 7)
    assert len(rows) == 15


def test_clustering_and_vacuum_protocol_features_accepted(spark, tmp_path):
    """Liquid-clustering (`clusteringColumns`) and vacuumProtocolCheck
    tables accept DML; the clustering domain metadata survives commits
    AND checkpoints (the writer's preserve obligation)."""
    import json as _json

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark), stats=True)
    c0 = os.path.join(path, "_delta_log", f"{0:020d}.json")
    acts = [_json.loads(ln) for ln in open(c0) if ln.strip()]
    for a in acts:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["vacuumProtocolCheck"],
                "writerFeatures": [
                    "clusteringColumns",
                    "domainMetadata",
                    "vacuumProtocolCheck",
                ],
            }
    acts.append(
        {
            "domainMetadata": {
                "domain": "delta.clustering",
                "configuration": _json.dumps(
                    {"clusteringColumns": [["k"]]}
                ),
                "removed": False,
            }
        }
    )
    with open(c0, "w") as fh:
        for a in acts:
            fh.write(_json.dumps(a) + "\n")
    r = DeltaLogReader(spark, path)
    r.delete_where([("k", "<", 5)])
    assert DeltaLogReader(spark, path).read().count() == 45
    # the clustering domain survives a checkpoint + vacuumed tail
    t2 = DeltaLogReader(spark, path)
    cp = t2.write_checkpoint()
    for v in range(cp + 1):
        os.unlink(os.path.join(path, "_delta_log", f"{v:020d}.json"))
    t3 = DeltaLogReader(spark, path)
    t3._replay(t3.latest_version())
    assert "delta.clustering" in t3._last_domains
    assert _json.loads(
        t3._last_domains["delta.clustering"]["configuration"]
    ) == {"clusteringColumns": [["k"]]}


def test_variant_type_reads_and_dml(spark, tmp_path):
    """Round 9: the `variantType` v3 feature — variant columns
    round-trip natively through Spark's VariantType (the (metadata,
    value) binary pair in parquet), and DML rewrites carry them."""
    path = str(tmp_path / "t")
    base = spark.sql(
        "SELECT id AS k, "
        "parse_json(concat('{\"n\": ', id, ', \"tag\": \"t', id, '\"}'))"
        " AS props FROM range(0, 20)"
    )
    create_minimal_table(spark, path, base)
    _patch_commit0(
        path,
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["variantType"],
            "writerFeatures": ["variantType"],
        },
    )
    r = DeltaLogReader(spark, path)
    got = r.read()
    assert dict(got.dtypes)["props"] == "variant"
    vals = {
        x.k: x.n
        for x in got.selectExpr(
            "k", "variant_get(props, '$.n', 'int') AS n"
        ).collect()
    }
    assert vals[7] == 7 and len(vals) == 20
    r.delete_where([("k", "<", 5)])
    r2 = DeltaLogReader(spark, path).read()
    assert r2.count() == 15
    assert r2.selectExpr(
        "max(variant_get(props, '$.n', 'int')) AS m"
    ).collect()[0].m == 19


def test_generated_columns_compute_on_append(spark, tmp_path):
    """Round 9: commit_append COMPUTES an omitted generated column
    from delta.generationExpression (the writer's generation
    obligation); provided values still validate elsewhere."""
    from introduction_in_big_data_spark.sources.deltalog import (
        commit_append,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, _df(spark))
    import json as _json

    c0 = os.path.join(path, "_delta_log", f"{0:020d}.json")
    acts = [_json.loads(ln) for ln in open(c0) if ln.strip()]
    for a in acts:
        if "metaData" in a:
            sch = _json.loads(a["metaData"]["schemaString"])
            sch["fields"][1]["metadata"] = {
                "delta.generationExpression": "CAST(k * 2 AS DOUBLE)"
            }
            a["metaData"]["schemaString"] = _json.dumps(sch)
    with open(c0, "w") as fh:
        for a in acts:
            fh.write(_json.dumps(a) + "\n")
    commit_append(
        spark, path, spark.createDataFrame([(500,), (501,)], "k long")
    )
    got = {
        x.k: x.v
        for x in DeltaLogReader(spark, path).read().collect()
        if x.k >= 500
    }
    assert got == {500: 1000.0, 501: 1002.0}
