"""Multimodal-column queries: binary content + typed metadata struct,
features extracted through the real Arrow/mapInPandas plumbing with a
deterministic kernel — so even the Pandas-UDF path is oracle-checked
(byte count + md5 have exact SQL twins)."""

from __future__ import annotations

from ..operators import multimodal
from .registry import register, t


@register(
    "multimodal_features",
    oracle="""
        SELECT doc_id AS media_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text)                  AS content_md5,
               'text/plain'               AS mime
        FROM documents
    """,
    tags=("multimodal", "udf"),
)
def multimodal_features(spark, sf_dir):
    """documents → binary media convention → mapInPandas feature
    kernel. Exercises exactly the batch shape a real image decoder
    would use (binary Arrow batches into Python, typed batches out);
    md5/n_bytes make the kernel output exactly verifiable."""
    media = multimodal.documents_as_media(t(spark, sf_dir, "documents"))
    return multimodal.extract_features(media)
