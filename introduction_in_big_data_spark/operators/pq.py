"""Product quantization (PQ) — the third rung of the ANN compression
ladder (fp32 -> SQ8 -> PQ): split each dim-D vector into M subvectors,
quantize each against its own K-centroid codebook, store M small codes
(M=8, K=16 -> 8 codes of 4 bits = 4 BYTES per vector vs 256 for fp32).
At 100 TB this is what makes an exhaustive re-rankable index fit in
executor memory; faiss's IndexPQ / IVF-PQ are the canonical forms
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011).

Spark-first shape:
- train: one pyspark.ml KMeans per subspace (seeded, sampled) — an
  offline job; codebooks are then frozen plan constants, the standard
  train-on-a-sample / index-everything deployment.
- encode: a pure per-row map against literal codebook arrays (zero
  shuffles, embarrassingly parallel).
- search (ADC — asymmetric distance computation): queries stay fp32;
  score(q, x) = sum_m ip(q_m, C[m][code_m(x)]) / (|q| * |x̂|) where
  x̂ is the reconstruction and |x̂|² = sum_m |C[m][code_m]|² exactly
  (subspaces are orthogonal coordinate blocks).

Determinism contract (full value-hash oracle, like ivf_topk_fixed):
encoding argmin compares  -2·ip(sub, c) + |c|²  (the |sub|² term is
constant per subvector) built from literal doubles with sequential
folds — bitwise equal to DuckDB list_inner_product over the same
inlined literals; ties break to the lowest code via first-position
semantics (`array_position(scores, array_min(scores))` on both
engines). Score sums run in fixed subspace order m=0..M-1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import barrier

from .similarity import dot as dot_fold

SIM_SCALE = 6


def train_pq_codebooks(
    vectors: DataFrame,
    n_subspaces: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train one k-means codebook per subspace (production path; the
    oracle queries use a frozen result of this — plans/pq_constants).
    Returns codebooks[m][j] = centroid j of subspace m."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(vectors.select(vec_col).first()[0])
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by M={n_subspaces}")
    d_sub = dim // n_subspaces
    books: list[list[list[float]]] = []
    for m in range(n_subspaces):
        sub = vectors.select(
            array_to_vector(
                F.slice(F.col(vec_col).cast("array<double>"), m * d_sub + 1, d_sub)
            ).alias("features")
        ).transform(barrier)
        model = KMeans(k=n_codes, seed=seed, maxIter=10).fit(sub)
        books.append(
            [
                (c.toArray() if hasattr(c, "toArray") else c).tolist()
                for c in model.clusterCenters()
            ]
        )
    return books


def _sub(v: Column, m: int, d_sub: int) -> Column:
    return F.slice(v, m * d_sub + 1, d_sub)


def _lit_arr(xs: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in xs])


def pq_encode_fixed(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add `code_{m}` (int) per subspace and `recon_norm` (double) —
    a per-row map over literal codebooks; zero shuffles."""
    d_sub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    norm_sq_terms = []
    for m, book in enumerate(codebooks):
        sub = _sub(v, m, d_sub)
        scores = F.array(
            *[
                F.lit(-2.0) * dot_fold(sub, _lit_arr(c))
                + F.lit(float(sum(x * x for x in c)))
                for c in book
            ]
        )
        code = (F.array_position(scores, F.array_min(scores)) - 1).cast("int")
        df = df.withColumn(f"code_{m}", code)
        norm_sq_terms.append(
            F.element_at(
                _lit_arr([float(sum(x * x for x in c)) for c in book]),
                F.col(f"code_{m}") + 1,
            )
        )
    norm_sq = norm_sq_terms[0]
    for term in norm_sq_terms[1:]:
        norm_sq = norm_sq + term
    return df.withColumn("recon_norm", F.sqrt(norm_sq))


def pq_topk_fixed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over PQ codes: broadcast the fp32 query set against
    the ENCODED corpus (codes + recon_norm only — the 4-byte-per-row
    scan that is PQ's entire point), score by subspace-wise literal
    centroid lookups, per-query window top-k."""
    d_sub = len(codebooks[0][0])
    enc = pq_encode_fixed(corpus, codebooks, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        *[f"code_{m}" for m in range(len(codebooks))],
        "recon_norm",
    )
    qv = F.col("qv")
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("qnorm", F.sqrt(dot_fold(qv, qv)))
        # zero-norm queries: Spark's x/0 is NULL while DuckDB's IEEE
        # division yields inf/nan — guard the query side like sq8_topk
        .filter(F.col("qnorm") > 0)
    )
    terms = [
        dot_fold(
            _sub(qv, m, d_sub),
            F.element_at(
                F.array(*[_lit_arr(c) for c in book]), F.col(f"code_{m}") + 1
            ),
        )
        for m, book in enumerate(codebooks)
    ]
    ip = terms[0]
    for term_col in terms[1:]:
        ip = ip + term_col
    scored = (
        F.broadcast(q)
        .crossJoin(enc.filter(F.col("recon_norm") > 0))
        .select(
            "query_id",
            "neighbor_id",
            F.round(ip / (F.col("qnorm") * F.col("recon_norm")), SIM_SCALE).alias(
                "sim_q"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim_q", "rn")
    )


def pq_topk_refined(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    codebooks: list[list[list[float]]],
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ shortlist + exact refine (faiss's IndexRefineFlat shape —
    the standard fix for PQ's lossy ranking): ADC over the 4-byte
    codes ranks a per-query shortlist, then ONLY those |Q|*shortlist
    rows join their fp32 vectors back for an exact cosine re-rank.
    At 100 TB the full scan touches codes; fp32 IO is proportional to
    the shortlist, not the corpus. Deterministic end to end (ADC
    shortlist and exact re-rank are both sequential folds), so the
    whole two-stage pipeline is value-hash checkable."""
    cand = pq_topk_fixed(corpus, queries, shortlist, codebooks, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cnorm", F.sqrt(dot_fold(F.col("cv"), F.col("cv"))))
    c = c.filter(F.col("cnorm") > 0)
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv2"),
        )
        .withColumn("qnorm2", F.sqrt(dot_fold(F.col("qv2"), F.col("qv2"))))
        .filter(F.col("qnorm2") > 0)
    )
    rescored = (
        cand.select("query_id", "neighbor_id")
        .join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_fold(F.col("qv2"), F.col("cv"))
                / (F.col("qnorm2") * F.col("cnorm")),
                SIM_SCALE,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", "rn")
    )


def ivfpq_topk_fixed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF x PQ — the production ANN composition (faiss IndexIVFPQ's
    shape, minus residual encoding; codes here quantize the raw
    vectors, which keeps both stages independently oracle-checkable):
    the IVF stage prunes WHICH rows are scored (each query probes
    `nprobe` cells -> candidate count ~ nprobe/|cells| of the corpus),
    the PQ stage shrinks WHAT is scanned per row (4-byte codes).
    At 100 TB those are the two independent levers: IO per row and
    rows touched. Everything is a literal sequential fold, so cell
    assignment, probing, ADC scores and ranks all value-hash match the
    SQL twin."""
    d_sub = len(codebooks[0][0])

    def fixed_cells(df: DataFrame, keep: int, out_id: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        norm = F.sqrt(dot_fold(v, v))
        structs = []
        for ci, c in enumerate(centroids):
            arr = F.array(*[F.lit(float(x)) for x in c])
            cn = float(sum(x * x for x in c) ** 0.5) or 1.0
            structs.append(
                F.struct(
                    F.lit(ci).alias("cell"),
                    (dot_fold(v, arr) / (norm * F.lit(cn))).alias("csim"),
                )
            )
        ranked = df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(vec_col),
            F.explode(F.array(*structs)).alias("c"),
        )
        w = Window.partitionBy(out_id).orderBy(F.desc("c.csim"), F.asc("c.cell"))
        return (
            ranked.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= keep)
            .select(out_id, F.col("c.cell").alias("cell"), vec_col)
        )

    enc = pq_encode_fixed(
        fixed_cells(corpus, 1, "neighbor_id"), codebooks, vec_col
    ).select(
        "neighbor_id",
        "cell",
        *[f"code_{m}" for m in range(len(codebooks))],
        "recon_norm",
    )
    qcells = fixed_cells(queries, nprobe, "query_id")
    qv = F.col("qv")
    q = (
        qcells.select(
            "query_id",
            "cell",
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("qnorm", F.sqrt(dot_fold(qv, qv)))
        .filter(F.col("qnorm") > 0)  # zero-norm guard, see pq_topk_fixed
    )
    terms = [
        dot_fold(
            _sub(qv, m, d_sub),
            F.element_at(
                F.array(*[_lit_arr(c) for c in book]), F.col(f"code_{m}") + 1
            ),
        )
        for m, book in enumerate(codebooks)
    ]
    ip = terms[0]
    for term_col in terms[1:]:
        ip = ip + term_col
    scored = q.join(enc.filter(F.col("recon_norm") > 0), "cell").select(
        "query_id",
        "neighbor_id",
        F.round(ip / (F.col("qnorm") * F.col("recon_norm")), SIM_SCALE).alias(
            "sim_q"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim_q", "rn")
    )


def residual_tables(
    centroids: list[list[float]], rcodebooks: list[list[list[float]]]
) -> tuple[list[float], list[list[list[float]]], list[list[float]]]:
    """Python-precomputed literal tables for residual IVF-PQ scoring —
    computed ONCE here and inlined into BOTH engines' plans so the
    floats are bit-identical by construction:
      csq[cell]          = |centroid|²
      xt[m][cell][code]  = dot(centroid_sub_m, rc[m][code])
      rn[m][code]        = |rc[m][code]|²
    giving |v̂|² = csq + 2·Σ_m xt + Σ_m rn exactly (v̂ = centroid + r̂;
    subspaces are coordinate blocks, so the cross term decomposes
    per subspace)."""
    d_sub = len(rcodebooks[0][0])
    csq = [float(sum(x * x for x in c)) for c in centroids]
    xt = [
        [
            [
                float(
                    sum(
                        c[m * d_sub + i] * rc[i]
                        for i in range(d_sub)
                    )
                )
                for rc in book
            ]
            for c in centroids
        ]
        for m, book in enumerate(rcodebooks)
    ]
    rn = [[float(sum(x * x for x in rc)) for rc in book] for book in rcodebooks]
    return csq, xt, rn


def ivfpq_residual_topk_fixed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    rcodebooks: list[list[list[float]]],
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """TRUE IVF-PQ (faiss IndexIVFPQ): PQ codes quantize the RESIDUAL
    v - centroid(cell), which is what makes PQ accurate inside IVF —
    residuals are small and centered, so 4 bits/subspace go much
    further than on raw vectors. Reconstruction v̂ = centroid + r̂;
    cosine ADC decomposes exactly into literal-fold terms:
      dot(q, v̂)  = dot(q, centroid) + Σ_m dot(q_m, rc[m][code_m])
      |v̂|²       = |c|² + 2·Σ_m xt[m][cell][code_m] + Σ_m |rc|²
    with every table Python-precomputed once (residual_tables) and
    inlined into both engines — the whole pipeline value-hash checks
    like its flat-PQ and IVF siblings."""
    d_sub = len(rcodebooks[0][0])
    m_count = len(rcodebooks)
    csq, xt, rn = residual_tables(centroids, rcodebooks)
    cents_arr = F.array(*[_lit_arr(c) for c in centroids])

    def fixed_cells(df: DataFrame, keep: int, out_id: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        norm = F.sqrt(dot_fold(v, v))
        structs = []
        for ci, c in enumerate(centroids):
            arr = _lit_arr(c)
            cn = float(sum(x * x for x in c) ** 0.5) or 1.0
            structs.append(
                F.struct(
                    F.lit(ci).alias("cell"),
                    (dot_fold(v, arr) / (norm * F.lit(cn))).alias("csim"),
                )
            )
        ranked = df.select(
            F.col(out_id),
            F.col(vec_col).alias(vec_col),
            F.explode(F.array(*structs)).alias("c"),
        )
        w = Window.partitionBy(out_id).orderBy(F.desc("c.csim"), F.asc("c.cell"))
        return (
            ranked.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= keep)
            .select(out_id, F.col("c.cell").alias("cell"), vec_col)
        )

    # --- corpus: cell, residual codes, exact recon norm -----------------
    cor = fixed_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), vec_col), 1, "neighbor_id"
    )
    v = F.col(vec_col).cast("array<double>")
    cent = F.element_at(cents_arr, F.col("cell") + 1)
    cor = cor.withColumn("_r", F.zip_with(v, cent, lambda x, y: x - y))
    for m, book in enumerate(rcodebooks):
        r_m = F.slice(F.col("_r"), m * d_sub + 1, d_sub)
        scores = F.array(
            *[
                F.lit(-2.0) * dot_fold(r_m, _lit_arr(rc)) + F.lit(rn[m][j])
                for j, rc in enumerate(book)
            ]
        )
        cor = cor.withColumn(
            f"code_{m}",
            (F.array_position(scores, F.array_min(scores)) - 1).cast("int"),
        )
    xt_sum = None
    rn_sum = None
    for m in range(m_count):
        xt_m = F.element_at(
            F.element_at(
                F.array(*[_lit_arr(row) for row in xt[m]]), F.col("cell") + 1
            ),
            F.col(f"code_{m}") + 1,
        )
        rn_m = F.element_at(_lit_arr(rn[m]), F.col(f"code_{m}") + 1)
        xt_sum = xt_m if xt_sum is None else xt_sum + xt_m
        rn_sum = rn_m if rn_sum is None else rn_sum + rn_m
    recon_sq = (
        F.element_at(_lit_arr(csq), F.col("cell") + 1)
        + F.lit(2.0) * xt_sum
        + rn_sum
    )
    enc = cor.select(
        "neighbor_id",
        "cell",
        *[f"code_{m}" for m in range(m_count)],
        F.sqrt(recon_sq).alias("recon_norm"),
    )

    # --- queries: probed cells, fp32 vector, dot(q, centroid) ------------
    q = fixed_cells(
        queries.select(F.col(id_col).alias("query_id"), vec_col), nprobe, "query_id"
    )
    qv = F.col(vec_col).cast("array<double>")
    q = q.select(
        "query_id",
        "cell",
        qv.alias("qv"),
        F.sqrt(dot_fold(qv, qv)).alias("qnorm"),
        dot_fold(qv, F.element_at(cents_arr, F.col("cell") + 1)).alias("qdotc"),
    ).filter(F.col("qnorm") > 0)  # zero-norm guard, see pq_topk_fixed

    ip = F.col("qdotc")
    for m, book in enumerate(rcodebooks):
        ip = ip + dot_fold(
            F.slice(F.col("qv"), m * d_sub + 1, d_sub),
            F.element_at(
                F.array(*[_lit_arr(rc) for rc in book]), F.col(f"code_{m}") + 1
            ),
        )
    scored = q.join(enc.filter(F.col("recon_norm") > 0), "cell").select(
        "query_id",
        "neighbor_id",
        F.round(ip / (F.col("qnorm") * F.col("recon_norm")), SIM_SCALE).alias(
            "sim_q"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim_q", "rn")
    )
