"""Unified read_table facade (sources/read_table.py): format
auto-detection from on-disk markers, predicate forwarding into the
lakehouse readers' file skipping, plain-filter fallback elsewhere."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.sources.read_table import (
    detect_format,
    read_table,
)


@pytest.fixture()
def base_df(spark):
    return spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("int").alias("p")
    )


def test_detect_and_read_delta(spark, tmp_path, base_df):
    from introduction_in_big_data_spark.sources.deltalog import (
        create_minimal_table,
    )

    path = str(tmp_path / "t")
    create_minimal_table(
        spark, path, base_df.repartitionByRange(4, "k"), stats=True
    )
    assert detect_format(path) == "delta"
    out = read_table(spark, path, predicates=[("k", ">=", 90)])
    assert sorted(x.k for x in out.collect()) == list(range(90, 100))


def test_detect_and_read_iceberg(spark, tmp_path, base_df):
    from introduction_in_big_data_spark.sources.iceberg import (
        create_minimal_table,
    )

    path = str(tmp_path / "t")
    create_minimal_table(spark, path, base_df, bounds=True)
    assert detect_format(path) == "iceberg"
    assert read_table(spark, path).count() == 100


def test_detect_and_read_acid(spark, tmp_path, base_df):
    from introduction_in_big_data_spark.sources.acidtable import AcidTable

    path = str(tmp_path / "t")
    AcidTable.create(spark, path, base_df)
    assert detect_format(path) == "acid"
    out = read_table(spark, path, predicates=[("p", "=", 3)])
    assert out.count() == 20


def test_exported_acid_table_prefers_delta(spark, tmp_path, base_df):
    """A table carrying both _log and _delta_log (AcidTable after
    export) dispatches to the Delta replay."""
    from introduction_in_big_data_spark.sources.acidtable import AcidTable
    from introduction_in_big_data_spark.sources.deltalog import (
        export_acid_table,
    )

    path = str(tmp_path / "t")
    AcidTable.create(spark, path, base_df)
    export_acid_table(spark, path)
    assert detect_format(path) == "delta"
    assert read_table(spark, path).count() == 100
    # and the export carries stats, so skipping works through the facade
    from introduction_in_big_data_spark.sources.deltalog import DeltaLogReader

    r = DeltaLogReader(spark, path)
    r.read(predicates=[("k", "<", 0)])
    assert r.last_scan["scanned_files"] == 0


def test_parquet_csv_and_format_override(spark, tmp_path, base_df):
    pq = str(tmp_path / "plain")
    base_df.write.parquet(pq)
    assert detect_format(pq) == "parquet"
    assert read_table(spark, pq, predicates=[("k", "<", 10)]).count() == 10

    csv = str(tmp_path / "f.csv")
    with open(csv, "w") as fh:
        fh.write("a,b\n1,x\n2,y\n")
    assert detect_format(csv) == "csv"
    assert read_table(spark, csv).count() == 2
    # explicit format overrides detection
    assert read_table(spark, pq, format="parquet").count() == 100


def test_unknown_layout_raises(tmp_path):
    empty = str(tmp_path / "e")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no recognizable table format"):
        detect_format(empty)
