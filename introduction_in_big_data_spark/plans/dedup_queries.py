"""Deduplication queries over the documents table (north-star
extension, SURVEY.md §7 Step 6): exact, n-gram Jaccard, MinHash-LSH,
SimHash.

The MinHash/LSH oracle SQL is generated from the same seed/band
constants as the engine (operators/dedup.py), so both engines compute
bit-identical md5-based signatures and band keys — the whole
approximate pipeline is exactly reproducible and therefore
hash-checkable, not just "approximately similar".

SimHash runs here in md5 mode so its signatures are reproducible too
(same trick); the xxhash64 mode in operators/dedup.py remains the
fastest-path default for library users.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.partitioning import spread_if_narrow
from ..operators import dedup
from .registry import register, t


def _docs_spread(spark, sf_dir):
    """documents projected + spread: the shingle/signature/gram map
    stages are per-row expensive, and the single-row-group test file
    would otherwise run them in ONE task (functions/partitioning.py;
    measured 3.0s->1.4s jaccard, 4.4s->1.5s substring at sf0.1).

    multiplier=0.5 (round 12): the array-form shingle pipeline removed
    the per-row sort-aggregate work, so at 2x (64 partitions) per-task
    scheduling dominates what each tiny task computes — the same
    regime char-LM hit. Measured ladder at matching probes:
    x2 jaccard 1.83s / minhash 1.23s, x1 1.40/1.27, x0.5 1.29/1.12,
    x0.25 1.35/1.33. At cluster scale a wide scan already plans more
    partitions than 0.5x cores and the spread is the identity."""
    return spread_if_narrow(t(spark, sf_dir, "documents"), multiplier=0.5)

JACCARD_THRESHOLD = 0.7
SHINGLE_N = 3

_SHINGLES_CTE = """
    WITH words AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
    sh AS (
        SELECT doc_id AS doc, unnest(list_distinct(
            CASE WHEN len(w) >= 3
                 THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)]
                 ELSE CAST([] AS VARCHAR[]) END)) AS shingle
        FROM words
    ),
    sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY doc)
"""


@register(
    "dedup_exact",
    oracle="""
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
               min(doc_id) AS rep_id,
               count(*)    AS group_size
        FROM documents
        GROUP BY fp
    """,
    tags=("dedup", "agg"),
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: one hash-aggregate on the normalized-content
    fingerprint. The only correct 100 TB exact-dedup plan — group on a
    32-byte key, never compare pairs."""
    d = t(spark, sf_dir, "documents")
    return dedup.exact_duplicates(d, "doc_id", "text")


_JACCARD_ORACLE = (
    _SHINGLES_CTE
    + f"""
    , inter AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) >= {JACCARD_THRESHOLD}
    """
)


@register(
    "dedup_jaccard",
    oracle=_JACCARD_ORACLE,
    tags=("dedup", "join"),
    bench=True,
)
def dedup_jaccard(spark, sf_dir):
    """Exact word-trigram Jaccard near-dup pairs via shingle self-join —
    the exact baseline the MinHash path approximates. Cost is
    Σ_s df(s)²; discriminative shingles keep it near-linear."""
    d = _docs_spread(spark, sf_dir)
    return dedup.jaccard_pairs(
        d, "doc_id", "text", n=SHINGLE_N, threshold=JACCARD_THRESHOLD
    )


@register(
    "dedup_jaccard_prefix",
    oracle=_JACCARD_ORACLE,
    tags=("dedup", "join", "scale"),
)
def dedup_jaccard_prefix(spark, sf_dir):
    """Same exact result as dedup_jaccard (same oracle SQL), but
    candidates come from prefix filtering (AllPairs/PPJoin; distributed
    layout per Vernica et al., SIGMOD 2010): join only each doc's
    rarest |A|-ceil(t|A|)+1 shingles — provably sufficient for J >= t —
    then verify candidates with one array_intersect per pair. Hot
    stop-shingles never enter the self-join, so the Σ df² blowup the
    naive plan risks at 100 TB is structurally avoided while staying
    exact. On this synthetic corpus shingles are near-uniformly rare,
    so the naive join is already cheap and the prefix machinery costs
    more than it saves (measured 5.0s vs 3.1s at sf0.1) — hence the
    naive variant keeps the bench line; on a real web corpus (Zipfian
    shingle df) the inequality reverses, which is why both exist."""
    d = _docs_spread(spark, sf_dir)
    return dedup.jaccard_pairs_prefix(
        d, "doc_id", "text", n=SHINGLE_N, threshold=JACCARD_THRESHOLD
    )


def _minhash_lsh_sql() -> str:
    seeds, bands = dedup.MINHASH_SEEDS, dedup.LSH_BANDS
    rows = seeds // bands
    sig_cols = ",\n               ".join(
        f"min(md5('{s}:' || shingle)) AS sig{s}" for s in range(seeds)
    )
    band_selects = "\n        UNION ALL\n".join(
        "        SELECT doc, {b} AS band, md5({expr}) AS key FROM sigs".format(
            b=b,
            expr=" || '|' || ".join(f"sig{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    return (
        _SHINGLES_CTE
        + f"""
    , sigs AS (
        SELECT doc,
               {sig_cols}
        FROM sh GROUP BY doc
    ),
    banded AS (
{band_selects}
    ),
    cands AS (
        SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
        FROM banded x JOIN banded y
          ON x.band = y.band AND x.key = y.key AND x.doc < y.doc
    ),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS inter
        FROM cands c
        JOIN sh a ON a.doc = c.doc_a
        JOIN sh b ON b.doc = c.doc_b AND b.shingle = a.shingle
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_a, doc_b,
           round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) >= {JACCARD_THRESHOLD}
    """
    )


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_lsh_sql(),
    tags=("dedup", "minhash", "lsh"),
    bench=True,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash→LSH→verify near-dedup — the 100 TB path: linear
    signatures, near-linear band join, exact Jaccard only on candidates.
    md5-based hashing makes the signatures reproducible in the oracle,
    so even this 'approximate' pipeline is hash-checked exactly."""
    d = _docs_spread(spark, sf_dir)
    return dedup.minhash_lsh_dedup(
        d, "doc_id", "text", n=SHINGLE_N, threshold=JACCARD_THRESHOLD
    )


@register(
    "dedup_clusters",
    # the reach CTE is recursive → RECURSIVE must be declared on the
    # whole WITH clause
    oracle=_SHINGLES_CTE.replace("WITH words", "WITH RECURSIVE words")
    + f"""
    , inter AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY doc_a, doc_b
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes sa ON sa.doc = doc_a
        JOIN sizes sb ON sb.doc = doc_b
        WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) >= {JACCARD_THRESHOLD}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT d.doc_id AS doc,
           least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS component
    FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
    GROUP BY d.doc_id
    """,
    tags=("dedup", "graph", "iterative"),
)
def dedup_clusters(spark, sf_dir):
    """Near-dup GROUPS, not just pairs: connected components over the
    exact-Jaccard pair graph by iterative min-label propagation — the
    step that turns pairwise detection into 'keep one per cluster'.
    The oracle computes the same components with a recursive-CTE
    transitive closure, so even the iterative algorithm is
    hash-checked exactly."""
    d = t(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(d, "doc_id", "text", n=SHINGLE_N, threshold=JACCARD_THRESHOLD)
    nodes = d.select(F.col("doc_id").alias("doc"))
    return dedup.connected_components(nodes, pairs)


SIMHASH_BITS = 64
SIMHASH_RADIUS = 4
SIMHASH_PREFIX = 8


def _simhash_oracle() -> str:
    """DuckDB twin of the md5-mode SimHash pipeline, generated from the
    same constants the engine uses — bit b of a token's hash is bit
    (3 - b%4) of hex digit b//4 of md5(token), so signatures (and
    therefore the blocked Hamming join) are byte-identical."""
    vote_cols = ",\n            ".join(
        f"sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, {b // 4 + 1}, 1)) - 1)"
        f" // {1 << (3 - b % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    bit_concat = " || ".join(
        f"CASE WHEN v{b} > 0 THEN '1' ELSE '0' END" for b in range(SIMHASH_BITS)
    )
    mismatch = " + ".join(
        f"CASE WHEN substr(a.simhash, {i}, 1) <> substr(b.simhash, {i}, 1)"
        f" THEN 1 ELSE 0 END"
        for i in range(1, SIMHASH_BITS + 1)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id AS doc, unnest(regexp_extract_all(text, '\\S+')) AS tok
            FROM documents
        ),
        hashed AS (SELECT doc, md5(tok) AS h FROM toks),
        votes AS (
            SELECT doc,
            {vote_cols}
            FROM hashed GROUP BY doc
        ),
        sigs AS (SELECT doc, {bit_concat} AS simhash FROM votes)
        SELECT a.doc AS doc_a, b.doc AS doc_b,
               CAST({mismatch} AS BIGINT) AS hamming
        FROM sigs a
        JOIN sigs b
          ON substr(a.simhash, 1, {SIMHASH_PREFIX}) = substr(b.simhash, 1, {SIMHASH_PREFIX})
         AND a.doc < b.doc
        WHERE {mismatch} <= {SIMHASH_RADIUS}
    """


@register("dedup_simhash", oracle=_simhash_oracle(), tags=("dedup", "simhash"))
def dedup_simhash(spark, sf_dir):
    """SimHash Hamming-distance near-dup pairs, in md5-reproducible
    mode so the ENTIRE pipeline — token hash bits, votes, signatures,
    prefix blocking, Hamming filter — is hash-checked against DuckDB
    (VERDICT r1 item 5; xxhash64 mode stays the scale default in
    operators/dedup.simhash)."""
    d = _docs_spread(spark, sf_dir)
    sh = dedup.simhash(d, "doc_id", "text", nbits=SIMHASH_BITS, hash_fn="md5")
    # radius 4: this corpus has a 31-word vocabulary, so unrelated docs
    # already share many token-hash votes; a wide radius floods the
    # output with weak pairs (36k rows at sf0.1 with radius 8)
    return dedup.hamming_pairs(
        sh, max_distance=SIMHASH_RADIUS, prefix_bits=SIMHASH_PREFIX
    )


FUZZY_MAX_DIST = 3


@register(
    "fuzzy_name_pairs",
    oracle=f"""
        WITH names AS (SELECT DISTINCT p_name FROM part),
        blocked AS (
            SELECT p_name,
                   regexp_extract(p_name, '(\\S+)$', 1) AS blk
            FROM names
        )
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    """,
    tags=("dedup", "join", "text"),
)
def fuzzy_name_pairs(spark, sf_dir):
    """Edit-distance fuzzy matching with blocking — typo-level near-dup
    detection (the string-similarity family member next to Jaccard /
    MinHash / SimHash). The quadratic all-pairs space is cut by an
    equi-join BLOCK KEY (the name's last token) before any levenshtein
    runs: the plan is a hash join on blk over the deduplicated name
    dictionary — tiny next to the corpus — with the O(len²) distance
    evaluated only inside blocks. The dictionary-first layout
    (distinct before pairing) is what keeps this viable at scale:
    string dictionaries grow sublinearly with corpus rows."""
    names = (
        t(spark, sf_dir, "part").select("p_name").distinct().withColumn(
            "blk", F.regexp_extract("p_name", r"(\S+)$", 1)
        )
    )
    a = names.select(F.col("p_name").alias("name_a"), "blk")
    b = names.select(F.col("p_name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
    )


@register(
    "dedup_keep_representatives",
    oracle=_SHINGLES_CTE.replace("WITH words", "WITH RECURSIVE words")
    + f"""
    , inter AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY doc_a, doc_b
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes sa ON sa.doc = doc_a
        JOIN sizes sb ON sb.doc = doc_b
        WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) >= {JACCARD_THRESHOLD}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
        SELECT d.doc_id AS doc,
               least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS component
        FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
        GROUP BY d.doc_id
    )
    SELECT component AS rep_id, CAST(count(*) AS BIGINT) AS cluster_size
    FROM comp GROUP BY component
    """,
    tags=("dedup", "graph", "curation"),
)
def dedup_keep_representatives(spark, sf_dir):
    """The dedup ENDPOINT a pipeline actually consumes: one
    representative per near-dup cluster (min doc id) with the cluster
    size as its dedup weight — `dedup_clusters`' component labels
    rolled up to keep-one-per-group. Downstream corpus assembly joins
    this against documents (left_semi on rep_id) to drop duplicates
    while preserving count-weighting for loss scaling."""
    d = t(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(
        d, "doc_id", "text", n=SHINGLE_N, threshold=JACCARD_THRESHOLD
    )
    nodes = d.select(F.col("doc_id").alias("doc"))
    comp = dedup.connected_components(nodes, pairs)
    return comp.groupBy(F.col("component").alias("rep_id")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )


@register(
    "substring_dup_stats",
    oracle="""
        WITH g AS (
            SELECT doc_id AS doc, md5(substr(text, p.p, 32)) AS h
            FROM documents,
                 unnest(list_filter(range(1, length(text) - 32 + 2),
                        p -> substr(md5(substr(text, p, 8)), 1, 1) = '0')) AS p(p)
            WHERE length(text) >= 32
        ),
        dup AS (
            SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc) >= 2
        ),
        cnt AS (SELECT doc, count(*) AS n_grams FROM g GROUP BY doc),
        dupc AS (
            SELECT doc, count(*) AS dup_grams FROM g
            WHERE h IN (SELECT h FROM dup) GROUP BY doc
        )
        SELECT c.doc, c.n_grams, coalesce(d.dup_grams, 0) AS dup_grams
        FROM cnt c LEFT JOIN dupc d USING (doc)
    """,
    tags=("dedup", "text", "scale"),
)
def substring_dup_stats(spark, sf_dir):
    """Char-level repeated-substring accounting (Lee et al. substring
    dedup): per document, how many 32-char grams at CONTENT-DEFINED
    anchor positions (md5-of-8-char-window hex digit = '0', expected
    gap 16 — alignment-independent, so arbitrary-offset copies are
    caught) also appear in ANOTHER document. Anchor selection and
    grams are byte-identical in DuckDB, so the whole pipeline — anchor
    predicate, gram md5s, cross-doc df, per-doc accounting — is
    hash-checked."""
    return dedup.substring_dup_stats(
        _docs_spread(spark, sf_dir), "doc_id", "text", gram_chars=32, anchor_window=8
    )
