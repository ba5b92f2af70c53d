"""IVF (inverted-file) approximate nearest neighbor — the second
standard ANN scale path next to LSH (operators/similarity.py).

Train: k-means cell centroids (pyspark.ml, seeded → deterministic).
Index: assign every corpus vector to its nearest centroid (one pass).
Query: probe only the `nprobe` nearest cells per query — searching
~nprobe/k of the corpus instead of all of it.

Scale notes: the index assignment is a per-row map against a broadcast
centroid set (k centroids × dim doubles — tiny); the probe join is an
equi-join on cell id, so the work per query is proportional to the
probed cells' population. Recall/latency trade via (k, nprobe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine, with_norm
from .similarity import dot as dot_fold


def _cell_assignments(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    n_cells_keep: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest `n_cells_keep` centroid ids per vector by cosine, as
    exploded (id, cell) rows.

    One Arrow-batched pandas_udf does the whole (batch, dim) @
    (dim, k) matmul + stable argsort (sim desc, cell asc on ties) —
    the same vectorized-kernel swap as similarity.with_lsh_bands: the
    previous form built k centroid literal arrays per row and folded
    each cosine through interpreted zip_with/aggregate, then ranked
    through a per-id window. Centroids ship inside the UDF closure
    (k·dim doubles — broadcast-equivalent)."""
    import numpy as np_
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = np_.array(centroids, dtype="float64")  # (k, dim)
    cn = np_.linalg.norm(cmat, axis=1)
    cn[cn == 0] = 1.0
    cu_t = (cmat / cn[:, None]).T  # (dim, k), unit-norm columns
    nk = n_cells_keep

    @pandas_udf("array<int>")
    def best_cells(v):  # hints omitted: module uses `from __future__ import annotations`
        res = [None] * len(v)
        mask = v.notna().to_numpy()
        if mask.any():
            mat = np_.stack(v[mask].to_numpy()).astype("float64")
            norms = np_.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat / norms[:, None]) @ cu_t  # (batch, k)
            # stable argsort of -sims: sim DESC, ties by cell ASC
            top = np_.argsort(-sims, axis=1, kind="stable")[:, :nk]
            for pos, row in zip(np_.flatnonzero(mask), top):
                res[pos] = row.tolist()
        return pd.Series(res, dtype="object")

    v = with_norm(vectors, vec_col)
    return v.select(
        F.col(id_col),
        F.col("_v"),
        F.col("_norm"),
        F.explode(best_cells(F.col(vec_col))).alias("cell"),
    )


def train_centroids(
    vectors: DataFrame, k: int, vec_col: str = "embedding", seed: int = 42
) -> list[list[float]]:
    """Seeded k-means centroids via pyspark.ml.

    Determinism (ADVICE r6): a fixed seed alone is NOT enough —
    k-means|| initialization samples per partition, so the same data
    under a different parallelism/file layout yields different
    centroids (and downstream cell assignments / recall). The training
    frame is therefore hash-repartitioned on its id column into a
    FIXED partition count and sorted within partitions — so
    row→partition assignment AND iteration order are functions of the
    data alone (range partitioning would NOT do: its boundary sampling
    is seeded by the rdd id), pinning the (seed, partitioning) pair so
    centroids — and every witness derived from them — are reproducible
    across environments. Cost: one exchange + in-partition sort of the
    (bounded) training sample."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    id_col = vectors.columns[0]
    # KMeans iterates maxIter times over this frame — cache it so each
    # iteration reads memory, not the parquet scan + conversion again
    ml_df = (
        vectors.repartition(8, F.col(id_col))
        .sortWithinPartitions(id_col)
        .select(
            array_to_vector(F.col(vec_col).cast("array<double>")).alias(
                "features"
            )
        )
        .cache()
    )
    model = KMeans(k=k, seed=seed, maxIter=10).fit(ml_df)
    ml_df.unpersist(blocking=False)
    # clusterCenters() yields numpy arrays (or ml.linalg Vectors in
    # older versions) — normalize either to plain lists
    return [
        (c.toArray() if hasattr(c, "toArray") else c).tolist()
        for c in model.clusterCenters()
    ]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate cosine top-k: corpus vectors live in 1 cell each;
    queries probe their `nprobe` nearest cells; exact cosine re-ranks
    within the probed population."""
    centroids = train_centroids(corpus, n_cells, vec_col, seed)
    corpus_cells = _cell_assignments(corpus, centroids, id_col, 1, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        "cell",
        F.col("_v").alias("cv"),
        F.col("_norm").alias("cn"),
    )
    query_cells = _cell_assignments(queries, centroids, id_col, nprobe, vec_col).select(
        F.col(id_col).alias("query_id"),
        "cell",
        F.col("_v").alias("qv"),
        F.col("_norm").alias("qn"),
    )
    scored = query_cells.join(corpus_cells, "cell").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", "rn")
    )


def ivf_topk_fixed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """Fixed-codebook IVF in ORACLE-REPRODUCIBLE mode: the centroids
    are frozen plan constants (train-on-a-sample, index-everything is
    standard IVF practice), and every centroid similarity uses the JVM
    sequential fold — bitwise identical to DuckDB's
    list_inner_product over the same literal doubles — so cell
    assignment, probe sets, and the exact re-rank are all value-hash
    checkable in SQL. `ivf_topk` (trained codebook + Arrow matmul
    assignment) remains the production path."""

    def cells(df: DataFrame, keep: int, out_id: str) -> DataFrame:
        v = with_norm(df)
        structs = []
        for ci, c in enumerate(centroids):
            arr = F.array(*[F.lit(float(x)) for x in c])
            cn = float(sum(x * x for x in c) ** 0.5) or 1.0
            structs.append(
                F.struct(
                    F.lit(ci).alias("cell"),
                    (dot_fold(F.col("_v"), arr) / (F.col("_norm") * F.lit(cn))).alias(
                        "csim"
                    ),
                )
            )
        ranked = v.select(
            F.col(id_col).alias(out_id),
            "_v",
            "_norm",
            F.explode(F.array(*structs)).alias("c"),
        )
        w = Window.partitionBy(out_id).orderBy(F.desc("c.csim"), F.asc("c.cell"))
        return (
            ranked.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= keep)
            .select(out_id, F.col("c.cell").alias("cell"), "_v", "_norm")
        )

    cor = cells(corpus, 1, "neighbor_id").select(
        "neighbor_id", "cell", F.col("_v").alias("cv"), F.col("_norm").alias("cn")
    )
    qry = cells(queries, nprobe, "query_id").select(
        "query_id", "cell", F.col("_v").alias("qv"), F.col("_norm").alias("qn")
    )
    # corpus keep=1 => each (query, neighbor) pair appears at most once
    scored = qry.join(cor, "cell").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", "rn")
    )
