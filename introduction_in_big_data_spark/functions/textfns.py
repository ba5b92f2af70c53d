"""Reusable text column expressions (pure built-in functions — JVM-side,
codegen'd; no Python in the data path).

Shared by operators/text.py (analysis) and operators/dedup.py (near-dup
detection). Every expression here has an exact DuckDB mirror used in the
oracle SQL, so the semantics are pinned:

  tokens(c)      = regexp_extract_all(c, '\\S+')        (whitespace split)
  shingles(c, n) = word n-grams joined by single spaces, de-duplicated
  normalize(c)   = lower + collapse whitespace + trim
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(c: Column) -> Column:
    """Whitespace tokenization. `regexp_extract_all('\\S+')` rather than
    split-on-space: it never emits empty tokens for leading/trailing/
    repeated whitespace, and DuckDB's regexp_extract_all agrees exactly."""
    return F.regexp_extract_all(c, F.lit(r"\S+"), 0)


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def normalize_text(c: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def shingles_from_tokens(toks: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED token array
    column.

    Built with sequence + transform over the token array — stays inside
    codegen, no explode until the caller needs rows. element_at is
    1-based; sequence(1, size-n+1) yields one window start per shingle.
    Documents shorter than n words produce an empty array (not null).

    Performance contract: `toks` must be a plain column reference
    (project `tokens(...)` with withColumn/select first). Passing the
    tokens(...) expression directly re-evaluates regexp_extract_all for
    every element_at inside the lambda — Catalyst does not CSE
    subexpressions across lambda bodies, which measured ~10x slower on
    the documents corpus.
    """
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.array_distinct(grams) if distinct else grams
