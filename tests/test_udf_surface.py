"""UDF-surface tests (SURVEY.md §2.10): each Python escape hatch must
agree exactly with its built-in JVM twin on the driver tables — pinning
semantics and proving the built-in path (the engine's hot path) computes
the same thing.
"""

from __future__ import annotations

from introduction_in_big_data_spark.functions.udfs import (
    SplitSentences,
    cosine_sim_udf,
    rmse_udf,
)
from introduction_in_big_data_spark.sources.tables import load_table
from pyspark.sql import functions as F


def test_scalar_pandas_udf_matches_builtin_cosine(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(50).alias("a")
    pairs = (
        e.join(
            load_table(spark, sf_dir, "embeddings").limit(50).alias("b"),
            F.col("a.vec_id") < F.col("b.vec_id"),
        )
        .select(
            F.col("a.embedding").cast("array<double>").alias("va"),
            F.col("b.embedding").cast("array<double>").alias("vb"),
        )
        .limit(200)
    )
    # built-in twin: zip_with dot product / aggregate norms (JVM-side)
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    got = pairs.select(
        cosine_sim_udf("va", "vb").alias("u"),
        (dot / (norm(F.col("va")) * norm(F.col("vb")))).alias("b"),
    ).collect()
    assert len(got) == 200
    # both paths compute in float64; only accumulation order differs
    assert all(abs(r["u"] - r["b"]) < 1e-12 for r in got)


def test_grouped_agg_pandas_udf_matches_builtin_rmse(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("pred"),
        F.col("l_discount").alias("actual"),
    )
    via_udf = li.groupBy("l_returnflag").agg(
        F.round(rmse_udf("pred", "actual"), 6).alias("rmse")
    )
    via_builtin = li.groupBy("l_returnflag").agg(
        F.round(F.sqrt(F.avg(F.pow(F.col("pred") - F.col("actual"), 2))), 6).alias(
            "rmse"
        )
    )
    a = {r["l_returnflag"]: r["rmse"] for r in via_udf.collect()}
    b = {r["l_returnflag"]: r["rmse"] for r in via_builtin.collect()}
    assert a == b and len(a) >= 2


def test_udtf_sentence_split(spark):
    spark.udtf.register("split_sentences", SplitSentences)
    df = spark.createDataFrame(
        [(1, "One. Two! Three?"), (2, None), (3, "no terminator")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("docs")
    rows = spark.sql(
        """
        SELECT doc_id, s.sent_idx, s.sentence
        FROM docs, LATERAL split_sentences(text) AS s
        ORDER BY doc_id, sent_idx
        """
    ).collect()
    got = [(r["doc_id"], r["sent_idx"], r["sentence"]) for r in rows]
    assert got == [
        (1, 0, "One."),
        (1, 1, "Two!"),
        (1, 2, "Three?"),
        (3, 0, "no terminator"),
    ]


def test_arrow_optimized_python_udf_matches_builtin(spark, sf_dir):
    """Spark 4's Arrow-optimized Python UDF (useArrow=True — Arrow
    batch transfer without the pandas layer) pinned to the built-in
    expression twin, completing the §2.10 UDF-surface matrix."""
    from pyspark.sql import functions as F
    from introduction_in_big_data_spark.sources.tables import load_table

    @F.udf("double", useArrow=True)
    def margin(price: float, discount: float) -> float:
        return price * (1.0 - discount)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_discount"
    ).limit(500)
    got = li.select(F.round(margin("l_extendedprice", "l_discount"), 2).alias("m"))
    want = li.select(
        F.round(F.col("l_extendedprice") * (1.0 - F.col("l_discount")), 2).alias("m")
    )
    assert sorted(r.m for r in got.collect()) == sorted(r.m for r in want.collect())
