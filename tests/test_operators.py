"""Semantics unit tests on hand-written fixtures (SURVEY.md §5 item 3):
the reference-derived pipelines with exact expected outputs,
implementing the *intended* behavior at every ⚠-flagged site."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import clean, relational, topk

BOOKS = [
    # (ISBN, title, author, year_str, publisher) — dirty mix per FIXTURES.md A1
    ("0123456789", "A", "Auth1", "1990", "P1"),
    ("012345678X", "B", "Auth1", "2005", "P1"),
    ("012345678|", "C", "Auth2", "1999", "P2"),  # '|' must NOT match (intended [\dX])
    ("1234", "D", "Auth2", "19xx", "P2"),  # bad ISBN and bad year
    ("0999999999", "E", "Auth3", "1950", "P3"),  # year below band
]


@pytest.fixture(scope="module")
def books(spark):
    return spark.createDataFrame(
        BOOKS, "isbn string, title string, author string, year string, publisher string"
    )


def test_isbn_regex_intended_semantics(books):
    """⚠ Part_A_Q1.py:21 wrote [\\d|X] which admits a literal '|'; the
    intended class is [\\dX]."""
    kept = clean.regex_filter(books, "isbn", r"^\d{9}[\dX]$")
    assert {r["isbn"] for r in kept.collect()} == {"0123456789", "012345678X", "0999999999"}


def test_year_cast_and_band(books):
    """Full cleaning chain in reference order (Part_A_Q1.py:21-29):
    ISBN regex → numeric-year regex → cast → band."""
    good_isbn = clean.regex_filter(books, "isbn", r"^\d{9}[\dX]$")
    numeric = clean.regex_filter(good_isbn, "year", r"^\d+$")
    cast = clean.cast_column(numeric, "year", "int", out="year_i")
    banded = clean.range_filter(cast, "year_i", 1967, 2020, inclusive=True)
    assert {r["isbn"] for r in banded.collect()} == {"0123456789", "012345678X"}


def test_exclusive_age_band(spark):
    users = spark.createDataFrame(
        [(1, 15.0), (2, 15.5), (3, 40.0), (4, 80.0), (5, None)],
        "uid int, age double",
    )
    kept = clean.range_filter(users, "age", 15.0, 80.0, inclusive=False)
    assert {r["uid"] for r in kept.collect()} == {2, 3}  # bounds excluded, null dropped


def test_zscore_filter_drops_outlier(spark):
    vals = [(i, 10.0) for i in range(20)] + [(99, 1000.0)]
    df = spark.createDataFrame(vals, "id int, v double")
    kept = clean.zscore_filter(df, "v", 3.0)
    ids = {r["id"] for r in kept.collect()}
    assert 99 not in ids and len(ids) == 20


def test_sigma_band_intended_semantics(spark):
    """⚠ Part_A_Q1.py:89-99 is dead code with a NameError; the intended
    op keeps rows within mean ± 3σ."""
    vals = [(i, float(i % 5)) for i in range(50)] + [(99, 10_000.0)]
    df = spark.createDataFrame(vals, "id int, v double")
    kept = clean.sigma_band_filter(df, "v", 3.0)
    assert 99 not in {r["id"] for r in kept.collect()}


def test_dedup_by_key_deterministic(spark):
    """⚠ Part_A_Q1.py:47 discards its drop_duplicates result; the
    engine's dedup keeps a deterministic representative."""
    df = spark.createDataFrame(
        [(1, "b", 2), (1, "a", 1), (2, "c", 3)], "k int, v string, ord int"
    )
    out = clean.dedup_by_key(df, ["k"], ["ord"]).collect()
    assert sorted((r["k"], r["v"]) for r in out) == [(1, "a"), (2, "c")]


def test_join_group_topk_pipeline(spark):
    """The intended Part_A_Q1.py:49-72 pipeline (⚠ authors_m NameError
    in the original): ratings ⋈ books → group by author → top-2."""
    ratings = spark.createDataFrame(
        [(u, i) for u, i in [(1, "A"), (2, "A"), (3, "A"), (1, "B"), (2, "B"), (1, "C")]],
        "uid int, isbn string",
    )
    books = spark.createDataFrame(
        [("A", "auth1"), ("B", "auth1"), ("C", "auth2")], "isbn string, author string"
    )
    joined = relational.join(ratings, books, on="isbn", broadcast=True)
    counts = relational.group_count(joined, ["author"], out="cnt")
    top = topk.top_k(counts, [F.desc("cnt"), F.asc("author")], 2).collect()
    assert [(r["author"], r["cnt"]) for r in top] == [("auth1", 5), ("auth2", 1)]


def test_fk_violations(spark):
    child = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    parent = spark.createDataFrame([(1,), (2,)], "k int")
    assert relational.fk_violations(child, parent, on="k").count() == 1


def test_pivot_matrix_zero_fill(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0), (1, "y", 3.0), (2, "x", 4.0)], "u int, i string, r double"
    )
    wide = relational.pivot_matrix(df, "u", "i", "r", col_values=["x", "y"]).collect()
    rows = {r["u"]: (r["x"], r["y"]) for r in wide}
    assert rows == {1: (2.0, 3.0), 2: (4.0, 0.0)}


def test_regression_errors(spark):
    df = spark.createDataFrame([(1.0, 2.0), (3.0, 3.0)], "p double, a double")
    row = relational.regression_errors(df, "p", "a").collect()[0]
    assert row["mae"] == pytest.approx(0.5)
    assert row["rmse"] == pytest.approx((0.5) ** 0.5)


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g1", 1, 10.0), ("g1", 2, 20.0), ("g1", 3, 5.0), ("g2", 4, 1.0)],
        "g string, id int, v double",
    )
    out = topk.top_k_per_group(df, ["g"], [F.desc("v"), F.asc("id")], 2).collect()
    assert sorted((r["g"], r["id"]) for r in out) == [("g1", 1), ("g1", 2), ("g2", 4)]


def test_zscore_per_group_matches_jvm_composition(spark):
    """applyInPandas grouped-map cleaner == the window/agg JVM form."""
    import random

    rng = random.Random(11)
    rows = [(g, i, rng.gauss(50, 5)) for g in ("a", "b") for i in range(200)]
    rows += [("a", 900, 10_000.0), ("b", 901, -10_000.0)]
    df = spark.createDataFrame(rows, "g string, id int, v double")

    via_udf = clean.zscore_filter_per_group(df, ["g"], "v", 3.0)

    from pyspark.sql import Window

    w = Window.partitionBy("g")
    via_jvm = (
        df.withColumn("m", F.avg("v").over(w))
        .withColumn("s", F.stddev_samp("v").over(w))
        .filter(F.abs((F.col("v") - F.col("m")) / F.col("s")) < 3.0)
        .select("g", "id", "v")
    )
    assert sorted(map(tuple, via_udf.collect())) == sorted(map(tuple, via_jvm.collect()))
    assert via_udf.filter(F.col("id") >= 900).count() == 0


def test_pack_token_shards_partition_invariant(spark):
    """The two-pass distributed prefix sum must assign identical shards
    regardless of how many range partitions it runs across — the
    property that makes it safe to scale the partition count with the
    data instead of funneling a global window through one executor."""
    from introduction_in_big_data_spark.operators.text import pack_token_shards

    import random

    rng = random.Random(7)
    df = spark.createDataFrame(
        [(f"d{i:05d}", "x " * rng.randint(1, 40)) for i in range(500)],
        "doc_id string, text string",
    )
    ntok = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))

    def shards(nparts):
        out = pack_token_shards(df, "doc_id", ntok, budget=100, num_partitions=nparts)
        return sorted((r["doc_id"], r["shard"]) for r in out.collect())

    single = shards(1)  # degenerate case == plain global running sum
    assert shards(32) == single
    assert shards(7) == single
    # shard ids are dense from 0
    ids = sorted({s for _, s in single})
    assert ids == list(range(len(ids)))


def test_pack_sequences_next_fit_hard_budget(spark):
    """Hard-boundary next-fit: no sequence exceeds the budget (except a
    single oversized doc alone), docs stay in id order, and the
    assignment equals the plain-Python scan."""
    from introduction_in_big_data_spark.operators.text import pack_sequences

    ntoks = [50, 60, 10, 100, 90, 130, 1, 1, 200, 120, 5]
    df = spark.createDataFrame(
        [(i, "x " * n) for i, n in enumerate(ntoks)], "doc_id long, text string"
    )
    out = {
        r.id: (r.grp, r.seq, r.ntok)
        for r in pack_sequences(
            df, "doc_id", F.size(F.split(F.trim(F.col("text")), " ")),
            budget=128, group_size=6,
        ).collect()
    }

    def ref(group):
        seqs, seq, fill, first = {}, 0, 0, True
        for i, n in group:
            if first:
                fill, first = n, False
            elif fill + n > 128:
                seq, fill = seq + 1, n
            else:
                fill += n
            seqs[i] = seq
        return seqs

    expect = {}
    for g in (0, 1):
        members = [(i, n) for i, n in enumerate(ntoks) if i // 6 == g]
        for i, s in ref(members).items():
            expect[i] = (g, s, ntoks[i])
    assert out == expect
    # hard budget: per (grp, seq) totals never exceed 128 unless the
    # sequence is a single oversized doc
    totals = {}
    for i, (g, s, n) in out.items():
        totals.setdefault((g, s), []).append(n)
    for ns in totals.values():
        assert sum(ns) <= 128 or len(ns) == 1
