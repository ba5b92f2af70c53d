"""Int8 scalar quantization (operators/quantize): reconstruction error
bound, recall vs the fp32 exact top-k, and the zero-vector guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import quantize, similarity
from introduction_in_big_data_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_sq8_roundtrip_error_bound(emb):
    """|v_i - code_i*scale| <= scale/2 element-wise (round-to-nearest),
    and codes stay inside [-127, 127]."""
    dec = quantize.sq8_decode(quantize.sq8_encode(emb))
    bad = dec.select(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("dequant"),
                lambda x, xhat: (F.abs(x - xhat) > F.col("scale") / 2 + 1e-12).cast(
                    "int"
                ),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        ).alias("violations"),
        F.aggregate(
            F.transform(F.col("codes"), lambda c: (F.abs(c) > 127).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ).alias("overflow"),
    ).agg(F.sum("violations").alias("v"), F.sum("overflow").alias("o")).first()
    assert bad.v == 0 and bad.o == 0


def test_sq8_topk_recall_vs_fp32_exact(emb):
    """int8 codes keep recall@5 high vs the fp32 exact ranking (64-dim
    gaussian-ish embeddings: quantization noise is ~0.4% per element)."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, queries, 5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in quantize.sq8_topk(emb, queries, 5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"SQ8 recall@5 = {recall}"


def test_sq8_zero_vector_guard(spark):
    """All-zero vector encodes to all-zero codes (scale 0, no NaN) and
    is excluded from similarity on both sides of the oracle contract."""
    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0, -2.0, 0.5, 4.0])], "vec_id long, embedding array<float>"
    )
    enc = quantize.sq8_encode(df).orderBy("vec_id").collect()
    assert enc[0].scale == 0.0 and set(enc[0].codes) == {0}
    assert max(abs(c) for c in enc[1].codes) == 127
    out = quantize.sq8_topk(df, df, k=2).collect()
    assert all(r.query_id != 1 and r.neighbor_id != 1 for r in out)
