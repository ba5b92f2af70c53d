"""Catalog of the driver's synthetic test tables (TESTDATA.md).

TPC-H-ish star schema (region nation customer supplier part orders
lineitem) plus `events` (stream fixture), `documents` (dedup/text
fixture) and `embeddings` (similarity fixture). One parquet file per
table under /root/testdata/sf{0.001,0.01,0.1}/.

Scale notes: parquet scans get column pruning + predicate pushdown from
Catalyst for free as long as queries stay declarative; at cluster scale
these would be multi-file datasets and the same `spark.read.parquet`
call parallelizes by row-group/file split automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
        # ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw longs, then rebuild
        # a microsecond TimestampType with exact integer division (`div`,
        # not `/`: ~1.7e18 ns exceeds double's 2^53 integer range).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql(...) works too."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
