"""MLlib-backed MinHash-LSH near-dedup — the pyspark.ml idiom
(`MinHashLSH.approxSimilarityJoin`, SURVEY.md §4 strategy #1) next to
the hand-rolled relational MinHash in operators/dedup.py.

Trade-offs vs the relational form:
- MLlib hashes into sparse CountVectorizer space and joins on hash
  buckets internally — less plan control, no oracle reproducibility
  (seeded but JVM-internal hashing), but one call and battle-tested.
- `approxSimilarityJoin` thresholds on JACCARD DISTANCE (1 - J).
- Requires a fitted CountVectorizer vocabulary — an extra pass; the
  relational form is vocabulary-free.

Kept as an alternative backend; the oracle-checked path stays
operators/dedup.minhash_lsh_dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingles


def ml_minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.7,
    num_hash_tables: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs with estimated Jaccard ≥ threshold via
    pyspark.ml MinHashLSH. Returns (doc_a, doc_b, jaccard_est)."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    shingle_sets = (
        doc_shingles(df, id_col, text_col, n)
        .groupBy("doc")
        .agg(F.collect_set("shingle").alias("shingles"))
    )
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True, minDF=1.0
    ).fit(shingle_sets)
    # every doc has ≥1 shingle (docs shorter than n words produce none
    # and are absent from shingle_sets), so no empty-vector filtering
    feats = cv.transform(shingle_sets)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    ).fit(feats)
    pairs = lsh.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col("datasetA.doc").alias("doc_a"),
            F.col("datasetB.doc").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("jaccard_est"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
