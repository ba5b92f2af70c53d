"""Query registry — the engine's declared, oracle-checked surface.

Every operator family from SURVEY.md §2 is exposed here as a named query
over the driver's test tables: a PySpark builder `(spark, sf_dir) ->
DataFrame` plus (where SQL-expressible) an equivalent ANSI-SQL string a
DuckDB oracle runs on the same parquet files. The driver hash-compares
the two at sf0.01; `tests/test_oracle.py` does the same at sf0.001.

Determinism rules (so order-insensitive value hashing matches):
- every computed column is aliased identically on both sides;
- floats produced by arithmetic are rounded (half-away-from-zero in
  both engines) to a fixed scale inside the query;
- every top-k / ranking query carries a unique tiebreaker column;
- sums of integers are cast to BIGINT on the DuckDB side (DuckDB sums
  to HUGEINT, Spark to LONG).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records a weaker rows-only check
    tags: tuple[str, ...] = field(default=())
    bench: bool = False  # include in bench.py headline timings


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags, bench)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand: load one driver table."""
    return load_table(spark, sf_dir, name)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
