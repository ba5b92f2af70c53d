"""Document-chunking query (north-star extension): sliding token
windows over the documents table, fingerprint-checked chunk by chunk
against a DuckDB list-comprehension oracle.
"""

from __future__ import annotations

from ..operators.chunking import chunk_token_windows
from .registry import register, t

CHUNK_SIZE = 32
CHUNK_STRIDE = 24


@register(
    "doc_chunks",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
            FROM documents
        ),
        st AS (
            SELECT doc_id, w, unnest(range(0, len(w), {CHUNK_STRIDE})) AS s
            FROM toks WHERE len(w) > 0
        )
        SELECT doc_id AS id,
               CAST(s // {CHUNK_STRIDE} AS INT) AS chunk_idx,
               CAST(len(w[s + 1 : s + {CHUNK_SIZE}]) AS INT)
                   AS n_chunk_tokens,
               md5(array_to_string(w[s + 1 : s + {CHUNK_SIZE}], ' '))
                   AS chunk_fp
        FROM st
    """,
    tags=("curation", "text", "explode"),
    bench=True,
)
def doc_chunks(spark, sf_dir):
    """Sliding {size}/{stride} token windows per document (overlapping
    chunks, LLM-pretraining layout). Per-document work only — the plan
    is scan → codegen'd slice/md5 → posexplode, zero shuffles, so it
    scales linearly with corpus bytes. chunk_idx positions and the
    shorter final chunk are pinned exactly by the md5 fingerprints.
    Reference analog: none (the reference never windows text); this is
    part of the BASELINE.json training-data surface next to
    token_shard_stats (packing) and sample_mix_by_source (sampling).
    """
    return chunk_token_windows(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        size=CHUNK_SIZE,
        stride=CHUNK_STRIDE,
    )
