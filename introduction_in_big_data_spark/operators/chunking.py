"""Document chunking for a training-data pipeline (north-star
extension, SURVEY.md §7 Step 6): split each document's token sequence
into fixed-size windows with overlap — the step that turns a curated
corpus into model-ready context-window pieces.

Scale shape: tokenization, window-start generation, and per-chunk
slicing are all pure column expressions (sequence/transform/slice) that
run inside WholeStageCodegen over the parquet scan; the only row
multiplication is one posexplode per chunk, and there is NO shuffle —
chunking is embarrassingly per-document. Downstream packing
(text.pack_token_shards) handles the global ordering.

Oracle-checked in plans/chunk_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import tokens


def chunk_token_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding token windows: chunk c covers tokens
    [c*stride, c*stride + size) (0-based); the final chunk may be
    shorter. stride < size ⇒ overlapping chunks (size-stride tokens of
    context carried across boundaries, the usual LLM-pretraining
    layout); stride == size ⇒ disjoint.

    Returns (id, chunk_idx, n_chunk_tokens, chunk_fp) — the md5
    fingerprint stands in for the chunk text so result rows stay narrow
    while still pinning the exact content; callers that need the text
    use the same slice expression without the md5.

    Empty documents produce zero chunks (not one empty chunk).
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    toks_df = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    )
    n = F.size("__toks")
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    exploded = toks_df.select(
        "id",
        "__toks",
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    chunk = F.slice("__toks", F.col("__start") + 1, size)
    return exploded.select(
        "id",
        "chunk_idx",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
    )
