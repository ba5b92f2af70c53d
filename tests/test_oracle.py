"""Differential tests: every registered query with an oracle must match
DuckDB on the same parquet inputs (SURVEY.md §5 item 1)."""

from __future__ import annotations

import pytest

from introduction_in_big_data_spark import plans
from introduction_in_big_data_spark.plans import typeaudit

from .oracle_utils import assert_matches_oracle

ORACLE_QUERIES = [name for name, spec in plans.REGISTRY.items() if spec.oracle]
ROWS_ONLY_QUERIES = [name for name, spec in plans.REGISTRY.items() if not spec.oracle]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_duckdb_oracle(spark, sf_dir, oracle_con, name):
    spec = plans.REGISTRY[name]
    spark_df = spec.fn(spark, sf_dir)
    rel = oracle_con.sql(f"SELECT * FROM ({spec.oracle}\n) __q LIMIT 0")
    duck_sig = typeaudit.schema_signature_duck(rel.columns, rel.types)
    duck_df = oracle_con.execute(spec.oracle).fetchdf()
    assert_matches_oracle(spark_df, duck_df, name)
    # Declared-type audit: the driver's canonical hash is type-
    # sensitive (HUGEINT vs LONG diverges even on identical values —
    # round-3 q12), so value equality alone is not enough.
    spark_sig = typeaudit.schema_signature_spark(spark_df.schema)
    mism = typeaudit.signature_mismatches(spark_sig, duck_sig)
    assert not mism, f"{name}: type-class mismatch: {mism}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_types_not_banned(oracle_con, name):
    """No oracle result column may be HUGEINT/DECIMAL: DuckDB infers
    HUGEINT for sums of bare integers, and the driver's type-sensitive
    hash then mismatches Spark's LONG even when values agree
    (registry.py determinism rule, made machine-checked)."""
    spec = plans.REGISTRY[name]
    rel = oracle_con.sql(f"SELECT * FROM ({spec.oracle}\n) __q LIMIT 0")
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if typeaudit.duck_type_class(t) in typeaudit.BANNED_ORACLE_CLASSES
    ]
    assert not offenders, (
        f"{name}: oracle returns driver-hash-unsafe types {offenders}; "
        "add CAST(... AS BIGINT/DOUBLE) in the oracle SQL"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = plans.REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
