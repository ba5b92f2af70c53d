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


# --- product quantization (operators/pq.py) ---


def test_pq_refine_recovers_adc_losses(emb, spark):
    """ADC over 4-byte codes is lossy on unclustered gaussian vectors;
    the refine stage must recover whatever the shortlist covers: (a)
    refined top-5 ⊆ shortlist, re-ranked by EXACT cosine (matches
    brute force on the covered set), (b) refined recall strictly
    dominates raw ADC recall, (c) shortlist coverage of the exact
    top-5 clears the measured floor (0.86 at sf0.001; bound 0.6)."""
    from pyspark.sql import functions as F

    from introduction_in_big_data_spark.operators import pq
    from introduction_in_big_data_spark.plans.pq_constants import (
        FIXED_PQ_CODEBOOKS,
    )

    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, queries, 5).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in pq.pq_topk_fixed(emb, queries, 5, FIXED_PQ_CODEBOOKS).collect()
    }
    shortlist = {
        (r.query_id, r.neighbor_id)
        for r in pq.pq_topk_fixed(emb, queries, 100, FIXED_PQ_CODEBOOKS).collect()
    }
    refined_rows = pq.pq_topk_refined(
        emb, queries, 5, FIXED_PQ_CODEBOOKS, shortlist=100
    ).collect()
    refined = {(r.query_id, r.neighbor_id) for r in refined_rows}
    assert refined <= shortlist
    coverage = len(exact & shortlist) / len(exact)
    assert coverage >= 0.6, f"shortlist coverage {coverage}"
    r_adc = len(exact & adc) / len(exact)
    r_ref = len(exact & refined) / len(exact)
    assert r_ref >= r_adc, (r_ref, r_adc)
    assert r_ref >= coverage - 1e-9  # refine keeps everything covered


def test_pq_codes_compact_and_deterministic(emb):
    """Codes live in [0, 15] (4 bits each) and encoding is a pure
    function — two independent plans produce identical codes."""
    from pyspark.sql import functions as F

    from introduction_in_big_data_spark.operators import pq
    from introduction_in_big_data_spark.plans.pq_constants import (
        FIXED_PQ_CODEBOOKS,
    )

    enc = pq.pq_encode_fixed(emb, FIXED_PQ_CODEBOOKS)
    row = enc.agg(
        F.min(F.least(*[F.col(f"code_{m}") for m in range(8)])).alias("lo"),
        F.max(F.greatest(*[F.col(f"code_{m}") for m in range(8)])).alias("hi"),
    ).first()
    assert 0 <= row.lo and row.hi <= 15
    a = sorted(map(tuple, pq.pq_encode_fixed(emb, FIXED_PQ_CODEBOOKS)
                   .select("vec_id", "code_0", "code_7").collect()))
    b = sorted(map(tuple, pq.pq_encode_fixed(emb, FIXED_PQ_CODEBOOKS)
                   .select("vec_id", "code_0", "code_7").collect()))
    assert a == b


def test_ivfpq_scores_consistent_with_full_adc(emb):
    """IVF x PQ returns exactly the ADC scores of full PQ, restricted
    to probed-cell candidates — the IVF stage may only PRUNE, never
    change a score; every query still fills its k slots on this data."""
    from collections import Counter

    from pyspark.sql import functions as F

    from introduction_in_big_data_spark.operators import pq
    from introduction_in_big_data_spark.plans.ivf_constants import (
        FIXED_IVF_CENTROIDS,
    )
    from introduction_in_big_data_spark.plans.pq_constants import (
        FIXED_PQ_CODEBOOKS,
    )

    queries = emb.filter(F.col("vec_id") < 10)
    full_adc = {
        (r.query_id, r.neighbor_id): r.sim_q
        for r in pq.pq_topk_fixed(emb, queries, 500, FIXED_PQ_CODEBOOKS).collect()
    }
    out = pq.ivfpq_topk_fixed(
        emb, queries, 5, FIXED_IVF_CENTROIDS, FIXED_PQ_CODEBOOKS, nprobe=2
    ).collect()
    assert Counter(r.query_id for r in out) == {q: 5 for q in range(10)}
    for r in out:
        assert (r.query_id, r.neighbor_id) in full_adc
        assert abs(full_adc[(r.query_id, r.neighbor_id)] - r.sim_q) < 1e-9


def test_residual_ivfpq_at_least_matches_flat_pq_recall(emb):
    """Residual coding is IVF-PQ's point: quantizing v - centroid
    keeps 4-bit subspace codes accurate where raw-vector codes lose
    rank fidelity. On the fixed test corpus (deterministic), residual
    recall@5 vs the fp32 exact ranking must be >= the flat composition
    and both must return k rows per query."""
    from pyspark.sql import functions as F

    from introduction_in_big_data_spark.operators import pq, similarity
    from introduction_in_big_data_spark.plans.ivf_constants import (
        FIXED_IVF_CENTROIDS,
    )
    from introduction_in_big_data_spark.plans.pq_constants import (
        FIXED_PQ_CODEBOOKS,
        FIXED_PQ_RESIDUAL_CODEBOOKS,
    )

    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, queries, 5).collect()
    }
    flat = {
        (r.query_id, r.neighbor_id)
        for r in pq.ivfpq_topk_fixed(
            emb, queries, 5, FIXED_IVF_CENTROIDS, FIXED_PQ_CODEBOOKS, nprobe=2
        ).collect()
    }
    res = {
        (r.query_id, r.neighbor_id)
        for r in pq.ivfpq_residual_topk_fixed(
            emb, queries, 5, FIXED_IVF_CENTROIDS, FIXED_PQ_RESIDUAL_CODEBOOKS,
            nprobe=2,
        ).collect()
    }
    assert len(flat) == 50 and len(res) == 50
    assert len(exact & res) >= len(exact & flat)
