"""Part_A_Q1.py reproduced end-to-end (intended semantics).

Reference pipeline (Part_A_Q1.py:10-86, with the ⚠ sites fixed per
SURVEY.md): CSV ingest → book cleaning (ISBN regex `[\\dX]`, numeric
year, 1967-2020 band) → user cleaning (15 < Age < 80 exclusive) →
ratings ⋈ books → per-author / per-title top-20 → ratings ⋈ users →
per-age top-20 → z-score outlier split on ratings.

Inputs are DataFrames in the Book-Crossing shape (FIXTURES.md A1-A3):
  books  : ISBN, Book-Title, Book-Author, Year-Of-Publication (dirty str), Publisher
  users  : User-ID, Age
  ratings: User-ID, ISBN, Book-Rating
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import clean, relational, topk

ISBN_RE = r"^\d{9}[\dX]$"  # intended class — the reference's [\d|X] admits '|'
YEAR_RE = r"^\d+$"
YEAR_LO, YEAR_HI = 1967, 2020
AGE_LO, AGE_HI = 15.0, 80.0


def clean_books(books: DataFrame) -> DataFrame:
    """Part_A_Q1.py:19-33 — regex ISBN, numeric year, cast, band."""
    b = clean.regex_filter(books, "ISBN", ISBN_RE)
    b = clean.regex_filter(b, "Year-Of-Publication", YEAR_RE)
    b = clean.cast_column(b, "Year-Of-Publication", "int", out="Year-Of-Publication")
    return clean.range_filter(b, "Year-Of-Publication", YEAR_LO, YEAR_HI, inclusive=True)


def clean_users(users: DataFrame) -> DataFrame:
    """Part_A_Q1.py:37-47 — exclusive age band + dedup by User-ID
    (the reference's discarded drop_duplicates, done deterministically)."""
    u = clean.range_filter(users, "Age", AGE_LO, AGE_HI, inclusive=False)
    return clean.dedup_by_key(u, ["User-ID"], ["User-ID"])


def batch_reports(
    books: DataFrame, users: DataFrame, ratings: DataFrame, k: int = 20
) -> dict[str, DataFrame]:
    """The full intended Part_A_Q1 run. Returns the report frames the
    reference prints/plots, all lazy."""
    b = clean_books(books)
    u = clean_users(users)

    rated_books = relational.join(ratings, b, on="ISBN", broadcast=True)
    top_authors = topk.top_k(
        relational.group_count(rated_books, ["Book-Author"], out="cnt"),
        [F.desc("cnt"), F.asc("Book-Author")],
        k,
    )
    top_titles = topk.top_k(
        relational.group_count(rated_books, ["Book-Title"], out="cnt"),
        [F.desc("cnt"), F.asc("Book-Title")],
        k,
    )

    rated_users = relational.join(ratings, u, on="User-ID", broadcast=True)
    top_ages = topk.top_k(
        relational.group_count(rated_users, ["Age"], out="cnt"),
        [F.desc("cnt"), F.asc("Age")],
        k,
    )

    kept = clean.zscore_filter(ratings, "Book-Rating", 3.0)
    outlier_stats = ratings.agg(F.count(F.lit(1)).alias("before")).crossJoin(
        kept.agg(F.count(F.lit(1)).alias("after"))
    )

    return {
        "top_authors": top_authors,
        "top_titles": top_titles,
        "top_ages": top_ages,
        "rating_outlier_stats": outlier_stats,
    }
