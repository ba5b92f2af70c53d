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
    vectors: DataFrame, centroids: list[list[float]], id_col: str, n_cells_keep: int
) -> DataFrame:
    """Nearest `n_cells_keep` centroid ids per vector by cosine, as
    exploded (id, cell) rows. Centroids ride the plan as literals —
    k·dim doubles, broadcast-equivalent."""
    v = with_norm(vectors)
    cent_structs = []
    for ci, c in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in c])
        norm = float(sum(x * x for x in c) ** 0.5) or 1.0
        cent_structs.append(
            F.struct(
                F.lit(ci).alias("cell"),
                cosine(F.col("_v"), arr, F.col("_norm"), F.lit(norm)).alias("csim"),
            )
        )
    ranked = v.select(
        F.col(id_col),
        F.col("_v"),
        F.col("_norm"),
        F.explode(F.array(*cent_structs)).alias("c"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("c.csim"), F.asc("c.cell"))
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_cells_keep)
        .select(id_col, F.col("c.cell").alias("cell"), "_v", "_norm")
    )


def train_centroids(
    vectors: DataFrame, k: int, vec_col: str = "embedding", seed: int = 42
) -> list[list[float]]:
    """Seeded k-means centroids via pyspark.ml (deterministic for a
    fixed seed + input)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml_df = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=10).fit(ml_df)
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
