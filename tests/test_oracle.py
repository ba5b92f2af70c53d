"""Differential tests: every registered query with an oracle must match
DuckDB on the same parquet inputs (SURVEY.md §5 item 1)."""

from __future__ import annotations

import pytest

from introduction_in_big_data_spark import plans

from .oracle_utils import assert_matches_oracle

ORACLE_QUERIES = [name for name, spec in plans.REGISTRY.items() if spec.oracle]
ROWS_ONLY_QUERIES = [name for name, spec in plans.REGISTRY.items() if not spec.oracle]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_duckdb_oracle(spark, sf_dir, oracle_con, name):
    spec = plans.REGISTRY[name]
    spark_df = spec.fn(spark, sf_dir)
    duck_df = oracle_con.execute(spec.oracle).fetchdf()
    assert_matches_oracle(spark_df, duck_df, name)


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
