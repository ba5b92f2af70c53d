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

    v = with_norm(vectors)
    return v.select(
        F.col(id_col),
        F.col("_v"),
        F.col("_norm"),
        F.explode(best_cells(F.col(vec_col))).alias("cell"),
    )


def train_centroids(
    vectors: DataFrame, k: int, vec_col: str = "embedding", seed: int = 42
) -> list[list[float]]:
    """Seeded k-means centroids via pyspark.ml (deterministic for a
    fixed seed + input)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # KMeans iterates maxIter times over this frame — cache it so each
    # iteration reads memory, not the parquet scan + conversion again
    ml_df = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    ).cache()
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
    corpus_cells = _cell_assignments(corpus, centroids, id_col, 1).select(
        F.col(id_col).alias("neighbor_id"),
        "cell",
        F.col("_v").alias("cv"),
        F.col("_norm").alias("cn"),
    )
    query_cells = _cell_assignments(queries, centroids, id_col, nprobe).select(
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
