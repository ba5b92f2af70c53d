"""Corpus-curation queries (north-star extension, SURVEY.md §7 Step 6):
train/test decontamination and PII redaction over the documents table.

The benchmark set for decontamination is a deterministic slice of the
corpus itself (doc_id % 20 == 0 — an "eval set" a twentieth the corpus
size), so the check is reproducible on any engine with no side files.

The PII queries plant a deterministic contact footer per document
before redacting: the synthetic corpus contains no organic PII, and a
redaction operator verified only on zero matches would be vacuous.
Both engines build the identical footer, so counts and redacted
fingerprints hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import curation
from .registry import register, t

DECONTAM_N = 3
DECONTAM_MIN_FRAC = 0.1

_SHINGLES_CTE = """
    WITH words AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
    sh AS (
        SELECT doc_id AS doc, unnest(list_distinct(
            CASE WHEN len(w) >= 3
                 THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)]
                 ELSE CAST([] AS VARCHAR[]) END)) AS shingle
        FROM words
    )
"""


@register(
    "decontam_overlap",
    oracle=_SHINGLES_CTE
    + f"""
    , bench AS (SELECT DISTINCT shingle FROM sh WHERE doc % 20 = 0),
    corpus AS (SELECT doc, shingle FROM sh WHERE doc % 20 <> 0),
    stats AS (
        SELECT doc, count(*) AS n_grams, count(b.shingle) AS n_hit
        FROM corpus c LEFT JOIN bench b USING (shingle)
        GROUP BY doc
    )
    SELECT doc, n_grams, n_hit,
           round(n_hit * 1.0 / n_grams, 6) AS overlap_frac
    FROM stats
    WHERE round(n_hit * 1.0 / n_grams, 6) >= {DECONTAM_MIN_FRAC}
    """,
    tags=("curation", "dedup", "join"),
)
def decontam_overlap(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing ≥10% of their
    distinct word trigrams with the eval slice. The eval side reduces
    to bare distinct n-grams and broadcasts (an eval set is always
    orders of magnitude smaller than the corpus), so the corpus scan
    never shuffles before its per-doc aggregate — the decisive
    property at 100 TB. See operators/curation.decontaminate."""
    d = t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    bench = d.filter(F.col("doc_id") % 20 == 0)
    return curation.decontaminate(
        corpus, bench, "doc_id", "text", n=DECONTAM_N,
        min_overlap_frac=DECONTAM_MIN_FRAC,
    )


_FOOTER_SQL = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or call 555-123-4567.'"
)


@register(
    "redact_pii_stats",
    oracle=f"""
        WITH planted AS (SELECT doc_id, {_FOOTER_SQL} AS ptext FROM documents)
        SELECT doc_id,
               len(regexp_extract_all(ptext, '{curation.EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(ptext, '{curation.PHONE_RE}')) AS n_phones,
               md5(regexp_replace(
                   regexp_replace(ptext, '{curation.EMAIL_RE}', '<EMAIL>', 'g'),
                   '{curation.PHONE_RE}', '<PHONE>', 'g')) AS red_fp
        FROM planted
    """,
    tags=("curation", "map"),
)
def redact_pii_stats(spark, sf_dir):
    """PII redaction: per-doc email/phone match counts plus the md5 of
    the redacted text (fingerprint, not the full text, keeps result
    rows narrow). Pure per-row expressions — scan-local at any scale.
    The planted footer guarantees ≥1 email and ≥1 phone per row, so
    the counts and the replacement logic are both non-vacuously
    checked against the oracle."""
    d = t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-123-4567."),
        ).alias("text"),
    )
    red = curation.redact_pii(planted, "text")
    return red.select(
        "doc_id", "n_emails", "n_phones", F.md5("redacted").alias("red_fp")
    )
