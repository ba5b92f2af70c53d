"""IO-surface tests (SURVEY.md §2.1): CSV scans with projection /
separator / encoding / drop-malformed, CSV sink, session-catalog DDL,
JDBC plan construction."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from introduction_in_big_data_spark.sources import read_csv, write_csv

BOOKS_SCHEMA = T.StructType(
    [
        T.StructField("isbn", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("year", T.IntegerType()),
    ]
)


def test_csv_sep_projection_and_dropmalformed(spark, tmp_path):
    """S1/S3 — `;`-separated scan with column projection and
    drop-malformed (Part_A_Q1.py:10-11, Part_A_Q2.py:74-76)."""
    p = tmp_path / "books.csv"
    p.write_text(
        "isbn;title;year\n"
        "0123456789;Alpha;1999\n"
        "too;many;fields;on;this;line\n"  # pandas error_bad_lines analog
        "0123456790;Beta;2001\n"
        "0123456791;Gamma;not_a_year\n"  # type-malformed
    )
    df = read_csv(
        spark, str(p), BOOKS_SCHEMA, sep=";", drop_malformed=True,
        columns=["isbn", "year"],
    )
    rows = {(r["isbn"], r["year"]) for r in df.collect()}
    # DROPMALFORMED drops extra-field and type-failing rows (short rows
    # would be null-padded — Spark's semantic, kept as documented)
    assert rows == {("0123456789", 1999), ("0123456790", 2001)}
    assert df.columns == ["isbn", "year"]


def test_csv_latin1_encoding(spark, tmp_path):
    """S2 — latin-1 CSVs (the Book-Crossing dumps' encoding)."""
    p = tmp_path / "latin1.csv"
    p.write_bytes("isbn;title;year\n1;Caf\xe9;2000\n".encode("latin-1"))
    df = read_csv(spark, str(p), BOOKS_SCHEMA, sep=";", encoding="ISO-8859-1")
    assert df.collect()[0]["title"] == "Café"


def test_csv_sink_roundtrip(spark, tmp_path):
    """S5 — distributed CSV write (replaces csv.writer, Part_A_Q2.py:64-71)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    out = str(tmp_path / "out_csv")
    write_csv(df, out)
    assert glob.glob(f"{out}/part-*.csv")
    back = spark.read.option("header", "true").schema("id int, v string").csv(out)
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_session_catalog_ddl(spark, tmp_path):
    """S8 — the reference's MySQL DDL (Part_A_Q2.py:16-40) on the Spark
    session catalog: CREATE DATABASE / CREATE TABLE / INSERT / DROP.
    PK/FK constraints become documented invariants (fk_orphan_counts)."""
    loc = tmp_path / "wh"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bx LOCATION '{loc}'")
    spark.sql(
        "CREATE TABLE IF NOT EXISTS bx.books (isbn STRING, title STRING) USING parquet"
    )
    spark.sql("INSERT INTO bx.books VALUES ('0123456789', 'Alpha')")
    got = spark.sql("SELECT isbn, title FROM bx.books").collect()
    assert [tuple(r) for r in got] == [("0123456789", "Alpha")]
    assert spark.catalog.tableExists("bx.books")
    spark.sql("DROP TABLE bx.books")
    spark.sql("DROP DATABASE bx")


def test_jdbc_writer_requires_driver(spark):
    """S6 — JDBC writer builds a valid plan; no MySQL server exists in
    the container, so the save must fail at connection time (not at
    plan construction)."""
    from introduction_in_big_data_spark.sources import write_jdbc

    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(Exception):
        write_jdbc(df, "jdbc:mysql://localhost:1/nope", "t", properties={"driver": "com.mysql.Driver"})


_DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
_DERBY_URL = "jdbc:derby:memory:ibd_jdbc_test;create=true"


def test_jdbc_roundtrip_embedded_derby(spark):
    """S6 end to end (VERDICT r1 item 6): write → read parity against
    embedded Derby — a real JDBC engine on Spark's own classpath (the
    same jars the Hive metastore uses), so the full codepath any
    warehouse driver exercises (type mapping, DDL, batch inserts,
    result-set reads) runs for real, no external server needed."""
    from introduction_in_big_data_spark.sources import read_jdbc, write_jdbc

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.25), (3, None, 0.0)],
        "id bigint, name string, val double",
    )
    write_jdbc(df, _DERBY_URL, "roundtrip", properties=_DERBY)
    back = read_jdbc(spark, _DERBY_URL, "roundtrip", properties=_DERBY)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # overwrite mode really replaces
    df2 = df.limit(1)
    write_jdbc(df2, _DERBY_URL, "roundtrip", properties=_DERBY)
    assert read_jdbc(spark, _DERBY_URL, "roundtrip", properties=_DERBY).count() == 1


def test_jdbc_partitioned_parallel_read(spark):
    """The scale path: partitioned JDBC read splits the key range into
    per-executor queries; row multiset must equal the single-connection
    read."""
    from introduction_in_big_data_spark.sources import read_jdbc, write_jdbc

    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    write_jdbc(df, _DERBY_URL, "partread", properties=_DERBY)
    par = read_jdbc(
        spark,
        _DERBY_URL,
        "partread",
        properties=_DERBY,
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert par.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, par.collect())) == sorted(map(tuple, df.collect()))


def test_summary_and_flatten(spark, sf_dir):
    """A10 df.summary() (approximate quartiles — excluded from oracle
    hash-checks per SURVEY.md §7 risk 5) and F14 flatten."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = li.select("l_quantity").summary()
    assert {r["summary"] for r in s.collect()} >= {"count", "mean", "min", "max", "50%"}
    df = spark.createDataFrame([([[1, 2], [3]],)], "a array<array<int>>")
    assert df.select(F.flatten("a").alias("f")).collect()[0]["f"] == [1, 2, 3]


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """partition_by + a partition filter → the scan lists only the
    matching hive partition (PartitionFilters in the plan), the on-disk
    layout downstream 100 TB readers rely on."""
    import io
    from contextlib import redirect_stdout

    from introduction_in_big_data_spark.sources import write_parquet
    from introduction_in_big_data_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    write_parquet(events, out, partition_by=["event_type"])
    import glob as g

    assert g.glob(f"{out}/event_type=*"), "hive-style partition dirs expected"

    back = spark.read.parquet(out).filter(F.col("event_type") == "error")
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "error" in plan
    n_err = events.filter(F.col("event_type") == "error").count()
    assert back.count() == n_err


def test_binary_files_roundtrip_png_decode(spark, tmp_path):
    """binaryFile source -> multimodal decode: write real PNG blobs to
    a directory, scan them back as (path, content), and run the stdlib
    PNG decoder over the binary column — the actual ingestion topology
    for an image corpus (files in object storage -> binary column ->
    mapInPandas kernel)."""
    from pyspark.sql import functions as F

    from introduction_in_big_data_spark.functions import codecs
    from introduction_in_big_data_spark.operators import multimodal
    from introduction_in_big_data_spark.sources.readers import read_binary_files

    d = tmp_path / "blobs"
    d.mkdir()
    for mid in (3, 7):
        rows = [
            [multimodal.png_rgb(mid, x, y) for x in range(multimodal.PNG_W)]
            for y in range(multimodal.PNG_H)
        ]
        (d / f"img_{mid}.png").write_bytes(
            codecs.encode_png(multimodal.PNG_W, multimodal.PNG_H, rows)
        )
    (d / "ignore.txt").write_text("not an image")

    scanned = read_binary_files(spark, str(d), glob="*.png")
    assert scanned.count() == 2
    media = scanned.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.png", 1)
        .cast("long")
        .alias("media_id"),
        "content",
    )
    stats = {r["media_id"]: r for r in multimodal.decode_png_stats(media).collect()}
    for mid in (3, 7):
        grays = [
            ch
            for y in range(multimodal.PNG_H)
            for x in range(multimodal.PNG_W)
            for ch in multimodal.png_rgb(mid, x, y)
        ]
        assert stats[mid]["px_min"] == min(grays)
        assert stats[mid]["px_max"] == max(grays)
        assert stats[mid]["r_sum"] == sum(
            multimodal.png_rgb(mid, x, y)[0]
            for y in range(multimodal.PNG_H)
            for x in range(multimodal.PNG_W)
        )


def test_orc_roundtrip_matches_parquet(spark, tmp_path, sf_dir):
    """ORC sink/source round trip: same rows, schema and values as the
    parquet original (nation: covers int/string)."""
    from introduction_in_big_data_spark.sources.readers import read_orc
    from introduction_in_big_data_spark.sources.tables import load_table
    from introduction_in_big_data_spark.sources.writers import write_orc

    nation = load_table(spark, sf_dir, "nation")
    p = str(tmp_path / "nation_orc")
    write_orc(nation, p)
    back = read_orc(spark, p)
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_orc_scan_pushes_filters(spark, tmp_path, sf_dir):
    from introduction_in_big_data_spark.sources.readers import read_orc
    from introduction_in_big_data_spark.sources.tables import load_table
    from introduction_in_big_data_spark.sources.writers import write_orc

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    p = str(tmp_path / "li_orc")
    write_orc(li, p)
    q = read_orc(spark, p).filter("l_quantity > 45").select("l_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)" in plan


def test_python_datasource_synthetic_docs(spark):
    """Spark 4 Python DataSource API: the registered synthetic corpus
    source generates per-partition on executors, honors the partition
    option, and is bit-deterministic across reads (splitmix64 content,
    no version-dependent RNG)."""
    from introduction_in_big_data_spark.sources.synthetic import (
        SyntheticDocsDataSource,
        doc_for,
    )

    spark.dataSource.register(SyntheticDocsDataSource)
    df = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 500)
        .option("n_partitions", 8)
        .option("seed", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in df.collect()}
    assert len(rows) == 500
    # executor content == the pure function, spot-checked across range
    for did in (0, 1, 137, 499):
        _, text, lang = doc_for(did, 7)
        assert rows[did] == (text, lang)
    # second read identical (determinism), different seed differs
    again = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 500)
        .option("n_partitions", 8)
        .option("seed", 7)
        .load()
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        (k, v[0], v[1]) for k, v in rows.items()
    )
    other = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 10)
        .option("seed", 8)
        .load()
    )
    assert {r["text"] for r in other.collect()} != {
        rows[i][0] for i in range(10)
    }
    # and a real operator runs over the generated corpus end to end
    from introduction_in_big_data_spark.operators.dedup import exact_duplicates

    dups = exact_duplicates(df, "doc_id", "text")
    assert dups.count() >= 0


def test_xml_roundtrip_nested_and_arrays(spark, tmp_path):
    """XML sink/source round trip via Spark 4's built-in XML source:
    scalars, a nested struct, and an array column (repeated element)
    survive write→read with a pinned schema."""
    from pyspark.sql import types as T

    from introduction_in_big_data_spark.sources.readers import read_xml
    from introduction_in_big_data_spark.sources.writers import write_xml

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField(
                "addr",
                T.StructType(
                    [
                        T.StructField("city", T.StringType()),
                        T.StructField("zip", T.StringType()),
                    ]
                ),
            ),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    rows = [
        (1, "alpha", ("Athens", "11111"), ["a", "b"]),
        (2, "beta", ("Berlin", "22222"), ["c"]),
    ]
    df = spark.createDataFrame(rows, schema)
    p = str(tmp_path / "xmlout")
    write_xml(df, p, row_tag="book", root_tag="books")
    back = read_xml(spark, p, row_tag="book", schema=schema).select(*df.columns)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_xml_attributes_and_inference(spark, tmp_path):
    """Hand-written XML with attributes: `_attr` columns + `_VALUE`
    text content, schema inferred — the shapes real feed XML has."""
    from introduction_in_big_data_spark.sources.readers import read_xml

    p = tmp_path / "feed.xml"
    p.write_text(
        """<catalog>
  <item sku="A1"><price currency="EUR">9.5</price><qty>3</qty></item>
  <item sku="B2"><price currency="USD">12.0</price><qty>7</qty></item>
</catalog>"""
    )
    df = read_xml(spark, str(p), row_tag="item")
    got = {
        r["_sku"]: (r["price"]["_currency"], float(r["price"]["_VALUE"]), r["qty"])
        for r in df.collect()
    }
    assert got == {"A1": ("EUR", 9.5, 3), "B2": ("USD", 12.0, 7)}


def test_csv_permissive_mode_captures_corrupt_records(spark, tmp_path):
    """The third CSV malformed-row policy next to DROPMALFORMED and
    FAILFAST: PERMISSIVE parks unparseable rows in _corrupt_record
    instead of dropping them — the audit-trail ingest mode."""
    p = tmp_path / "dirty.csv"
    p.write_text("1;alpha;10\n2;beta;notanumber\n3;gamma;30\n")
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("qty", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("sep", ";")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
        .cache()  # SPARK-21610: corrupt-record column needs a materialized frame
    )
    rows = {r.id: (r.qty, r._corrupt_record) for r in df.collect()}
    assert rows[1] == (10, None) and rows[3] == (30, None)
    assert rows[2][0] is None and "notanumber" in rows[2][1]
    df.unpersist(blocking=False)


def test_python_streaming_datasource_synthetic_docs(spark, tmp_path):
    """Spark 4 STREAMING Python DataSource: the synthetic corpus
    arrives docs_per_batch per micro-batch; the completed stream must
    equal the batch read of the same options exactly (content is a
    pure function of (doc_id, seed)), and batches must respect the
    offset arithmetic (ceil(n_docs / per_batch) non-empty batches)."""
    import time as _t

    from introduction_in_big_data_spark.sources.synthetic import (
        SyntheticDocsDataSource,
        doc_for,
    )

    try:
        spark.dataSource.register(SyntheticDocsDataSource)
    except Exception:
        pass  # already registered by the batch test in this session
    n_docs, per_batch = 57, 20
    batches = []

    def sink(df, epoch_id):
        rows = df.collect()
        if rows:
            batches.append([tuple(r) for r in rows])

    q = (
        spark.readStream.format("synthetic_docs")
        .option("n_docs", n_docs).option("docs_per_batch", per_batch)
        .option("n_partitions", 2).option("seed", 11)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = _t.time() + 120
    while _t.time() < deadline:
        if sum(len(b) for b in batches) >= n_docs:
            break
        _t.sleep(0.5)
    q.stop()
    got = sorted(r for b in batches for r in b)
    assert got == [doc_for(i, 11) for i in range(n_docs)]
    # offset arithmetic: 20+20+17 -> exactly 3 non-empty batches
    assert len(batches) == 3
    assert [len(b) for b in batches] == [20, 20, 17]
