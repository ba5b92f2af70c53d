"""Order-insensitive result comparison between a Spark DataFrame and a
DuckDB oracle result — a local approximation of the driver's
row-count + schema + value-hash check."""

from __future__ import annotations

import math

import pandas as pd


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        # queries round floats in-engine; this guards against residual
        # binary-representation noise only
        return f"{v:.9g}"
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def assert_matches_oracle(spark_df, duck_df: pd.DataFrame, name: str = "") -> None:
    sp = spark_df.toPandas()
    assert sorted(sp.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch: spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}"
    )
    assert len(sp) == len(duck_df), f"{name}: row count {len(sp)} != oracle {len(duck_df)}"
    a, b = canon_rows(sp), canon_rows(duck_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
