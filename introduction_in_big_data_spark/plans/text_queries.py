"""Text-analysis queries over the documents table (north-star
extension: language-ID, quality scoring, token counting, document
fingerprinting — SURVEY.md §7 Step 6).

Tokenization is pinned to `regexp_extract_all('\\S+')` on both engines
(never split-on-space, which disagrees about empty tokens).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.textfns import token_count, tokens
from ..operators import text as textops
from .registry import register, t


@register(
    "text_token_stats",
    oracle="""
        SELECT doc_id,
               n_tokens,
               n_chars_m,
               round(nospace_chars * 1.0 / greatest(n_tokens, 1), 4) AS avg_token_len
        FROM (
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\S+'))                    AS n_tokens,
                   length(text)                                             AS n_chars_m,
                   length(regexp_replace(text, '\\s+', '', 'g'))            AS nospace_chars
            FROM documents
        )
    """,
    tags=("text",),
    bench=True,
)
def text_token_stats(spark, sf_dir):
    """Token/char statistics — pure per-row map, zero shuffles; the
    whole operator runs inside the parquet scan stage at any scale."""
    d = t(spark, sf_dir, "documents")
    return textops.with_token_stats(d, "text").select(
        "doc_id", "n_tokens", "n_chars_m", "avg_token_len"
    )


@register(
    "text_bpe_token_count",
    oracle="""
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens,
               len(regexp_extract_all(text, '\\S+'))                         AS n_ws_tokens
        FROM documents
    """,
    tags=("text",),
)
def text_bpe_token_count(spark, sf_dir):
    """BPE-ish token counting: alphanumeric runs + individual
    punctuation marks (the pre-tokenizer split most BPE vocabularies
    assume), next to plain whitespace tokens. A cheap, pure-regex proxy
    for LLM token budgeting at scan speed — per-row map, zero shuffles."""
    d = t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(c, F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(F.regexp_extract_all(c, F.lit(r"\S+"), 0)).alias("n_ws_tokens"),
    )


@register(
    "text_quality",
    oracle=f"""
        SELECT doc_id,
               round(0.4 * len_ok
                   + 0.3 * least(1.0, stop * 5.0 / n)
                   + 0.3 * (ttr * 1.0 / n), 4) AS quality
        FROM (
            SELECT doc_id,
                   greatest(len(toks), 1) AS n,
                   len(list_filter(toks, x -> x IN {textops.LANG_MARKERS["en"]!r})) AS stop,
                   len(list_distinct(toks)) AS ttr,
                   CASE WHEN len(toks) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END AS len_ok
            FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents)
        )
    """,
    tags=("text",),
)
def text_quality(spark, sf_dir):
    """Heuristic quality score (length band + stopword ratio +
    type-token ratio) — the text twin of the reference's outlier-band
    cleaning. Per-row map, shuffle-free."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", textops.quality_score(F.col("text")).alias("quality"))


def _lang_case_sql() -> str:
    score = {
        lang: f"len(list_filter(toks, x -> x IN {markers!r}))"
        for lang, markers in textops.LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    whens = "\n".join(
        f"WHEN {score[lang]} = best AND best > 0 THEN '{lang}'"
        for lang in textops.LANG_MARKERS
    )
    return f"""
        SELECT doc_id, CASE {whens} ELSE 'und' END AS pred_lang
        FROM (
            SELECT doc_id, toks, {best} AS best
            FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
                  FROM documents)
        )
    """


@register("text_language_id", oracle=_lang_case_sql(), tags=("text",))
def text_language_id(spark, sf_dir):
    """Marker-stopword language ID with fixed tie precedence — a cheap
    deterministic per-row classifier (the scale answer is 'filter
    first, model later')."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", textops.language_id(F.col("text")).alias("pred_lang"))


@register(
    "text_fingerprints",
    oracle="""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents
    """,
    tags=("text", "dedup"),
)
def text_fingerprints(spark, sf_dir):
    """Normalized-content fingerprint (md5 of lower+whitespace-collapsed
    text) — the exact-dedup key."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", textops.fingerprint(F.col("text")).alias("fp"))


@register(
    "text_winnow_fingerprints",
    oracle="""
        WITH normed AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
            FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   [substr(md5(substr(norm, i, 8)), 1, 16)
                    for i in range(1, greatest(length(norm) - 7, 0) + 1)] AS hashes
            FROM normed
        ),
        winnowed AS (
            SELECT doc_id,
                   list_distinct([list_min(hashes[i:i+15])
                                  for i in range(1, greatest(len(hashes) - 15, 0) + 1)]) AS fps
            FROM hashed
        )
        SELECT doc_id, unnest(fps) AS fingerprint FROM winnowed
    """,
    tags=("text", "dedup", "fingerprint"),
)
def text_winnow_fingerprints(spark, sf_dir):
    """Rolling-hash winnowing fingerprints (char 8-grams, window 16) —
    substring-level near-dup signal; docs sharing any ≥23-char run
    share a fingerprint. md5-based → the whole rolling-hash pipeline is
    oracle-hash-checked."""
    d = t(spark, sf_dir, "documents")
    return textops.winnow_fingerprints(d, "doc_id", "text", k=8, window=16)


@register(
    "text_ngram_freq",
    oracle="""
        WITH words AS (SELECT string_split_regex(text, '\\s+') AS w FROM documents),
        grams AS (
            SELECT unnest(CASE WHEN len(w) >= 2
                               THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
                               ELSE CAST([] AS VARCHAR[]) END) AS bigram
            FROM words
        )
        SELECT bigram, count(*) AS cnt
        FROM grams
        GROUP BY bigram
        ORDER BY cnt DESC, bigram
        LIMIT 50
    """,
    tags=("text", "agg"),
)
def text_ngram_freq(spark, sf_dir):
    """Corpus-level bigram frequencies, top-50 — explode + hash-agg +
    TakeOrdered; the shuffle carries only (bigram, partial count)."""
    from ..functions.textfns import shingles_from_tokens

    d = t(spark, sf_dir, "documents")
    tokenized = d.select(tokens(F.col("text")).alias("__toks"))
    grams = tokenized.select(
        F.explode(shingles_from_tokens(F.col("__toks"), n=2, distinct=False)).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(50)
    )
