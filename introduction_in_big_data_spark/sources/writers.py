"""Writers / sinks.

Covers SURVEY.md §2.1 S5-S8:
- S5 CSV sink (Part_A_Q2.py:64-71 csv.writer) → distributed CSV write.
- S6/S7 MySQL load (Part_A_Q2.py:46-59) → the JDBC batch writer; Spark
  never inserts row-at-a-time (the reference's S7 path is also broken —
  it targets a table its DDL never creates, Part_A_Q2.py:49,53).
- S8 DDL (Part_A_Q2.py:16-40) → `spark.sql("CREATE ...")` on the session
  catalog; the reference's PK/FK constraints become data-quality checks
  (see operators.relational.fk_violations) since Spark doesn't enforce
  constraints.

Scale notes: every writer below is a distributed, partition-parallel
write. `partition_by` produces hive-style directory partitioning, the
standard layout for downstream partition pruning at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_parquet_sharded(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    target_files: int | None = None,
) -> None:
    """Parquet write with output-file-size control — the small-files /
    giant-files problem is the #1 operational failure of petabyte
    writes (a 100 TB job with 200k tasks otherwise emits 200k files per
    partition dir; conversely one task per dir emits one unsplittable
    monster).

    Two independent knobs:
    - `max_records_per_file` caps rows per file (Spark splits a task's
      output into multiple files; no shuffle added).
    - `target_files` repartitions to exactly that many output tasks —
      a shuffle, but one that also rebalances skewed upstream
      partitions. With `partition_by`, repartitioning on the partition
      columns routes each hive dir's rows to one task (fewer, bigger
      files per dir).
    """
    out = df
    if target_files:
        out = (
            df.repartition(target_files, *partition_by)
            if partition_by
            else df.repartition(target_files)
        )
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC table sink (S6). Replaces the reference's `df.to_sql(...,
    if_exists='replace')` (Part_A_Q2.py:55-59). Requires the JDBC driver
    jar on the classpath. Round-trip-tested end to end against embedded
    Derby (`jdbc:derby:memory:...` — the Derby jars ship with Spark
    itself), which exercises the same codepath any warehouse driver
    uses; see tests/test_sources.py::test_jdbc_roundtrip_embedded_derby.
    """
    writer = df.write.format("jdbc").mode(mode).option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib default codec) — the columnar alternative when a
    consumer ecosystem is Hive/ORC-native; round-trip-tested against
    the parquet path in tests/test_sources.py."""
    df.write.mode(mode).orc(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (Spark 4 built-in) — one `row_tag` element per row
    under `root_tag` per output file; struct columns nest, array
    columns repeat the element. Round-trip-tested (incl. attribute
    round trip) in tests/test_sources.py."""
    (
        df.write.format("xml")
        .mode(mode)
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )
