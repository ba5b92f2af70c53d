"""Deduplication operators for a training-data pipeline (north-star
extension, SURVEY.md §7 Step 6): exact, n-gram Jaccard, MinHash-LSH,
SimHash.

Scale design — the whole point of this module:
- exact_duplicates: one hash-aggregate on a 32-byte key. The only
  correct way to exact-dedup 100 TB (never pairwise compare).
- Jaccard via shingle self-join: cost is Σ_s n_s² over shingle
  popularity — fine when shingles are discriminative; degenerate
  (stop-shingles) keys must be capped (`max_shingle_freq`).
- MinHash-LSH: the scale path. Signatures are per-doc aggregates
  (linear); banding turns "all pairs" into "pairs sharing a band key"
  (near-linear for realistic dup rates); only candidates pay the exact
  Jaccard verify. This is the standard web-scale near-dedup layout.
- SimHash: linear signature; near-dups = small Hamming distance.

Hash choices are md5 (MinHash) so the DuckDB oracle can reproduce the
exact signatures, and xxhash64 (SimHash) where no oracle parity is
needed (verified by a pytest property test instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import barrier

from ..functions.textfns import shingles_from_tokens, tokens

MINHASH_SEEDS = 9  # signature length
LSH_BANDS = 3  # bands of 3 rows each → catches J ≳ 0.7 reliably


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-dup groups by md5(normalized text): (fingerprint,
    representative id, group size). Representative = min id —
    deterministic, oracle-checkable."""
    from .text import fingerprint

    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Exploded distinct word n-grams: (id, shingle). Tokenizes in a
    separate projection so the regex runs once per row, not once per
    element_at (see shingles_from_tokens' performance contract)."""
    tokenized = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__toks")
    )
    return tokenized.select(
        "doc", F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("shingle")
    )


def doc_shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-grams kept IN-ROW: (doc, sh array<string>, sz) —
    the array-form twin of `doc_shingles` (round 12, guide §2.3/§2.4).

    Keeping the shingle set in its document's row makes three
    downstream steps row-local instead of aggregates over the exploded
    stream: per-doc set size is `size(sh)` (was a groupBy(doc) count —
    one exchange per consumer), MinHash signatures are
    `array_min(transform(sh, ...))` (was `min(string)` aggregates,
    which are not hash-aggregatable and forced a SortAggregate with a
    full sort of the shingle stream on BOTH band-join sides), and
    candidate verification is `size(array_intersect(a, b))` (was a
    (doc, shingle) equi-join plus a pair groupBy — two more
    exchanges).

    Returns the RAW frame: short docs carry an EMPTY array (explode
    would drop them) — callers filter `size(sh) >= 1` themselves,
    AFTER a materialization barrier. Filtering here is a planning
    trap: Catalyst's project-collapse/filter-pushdown substitutes the
    whole nested-HOF shingle expression into the filter condition (and
    into every later use), and optimizer passes over the duplicated
    tree cost 10-14 SECONDS of driver time per plan (measured at
    round 12; the plain projection plans in <1s)."""
    tokenized = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__toks")
    )
    return tokenized.select(
        "doc", shingles_from_tokens(F.col("__toks"), n).alias("sh")
    )


def _shingle_arrays_materialized(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(doc, sh, sz) over a lazy localCheckpoint of the raw array
    frame, empties dropped. The checkpoint is the planning barrier:
    size()/filter are trivial attribute expressions over the stored
    blocks, never substituted into the shingle HOF expression (see
    doc_shingle_arrays). Blocks are GC-freed; lineage-drop trade-off
    as documented on jaccard_pairs."""
    raw = doc_shingle_arrays(df, id_col, text_col, n).transform(barrier)
    return raw.select(
        "doc", "sh", F.size("sh").alias("sz")
    ).filter(F.col("sz") >= 1)


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.7,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle self-join.

    |A∩B| from the join, |A∪B| = |A|+|B|-|A∩B| from per-doc sizes.
    `max_shingle_freq` drops degenerate stop-shingles that appear in
    more than N docs — they contribute O(N²) join rows but almost no
    Jaccard signal (same trick as dropping stopwords).

    Spill-safety note (ADVICE r12): the default path forces a
    shuffled-hash self-join, which — unlike sort-merge — cannot spill
    its build side. One degenerate hot shingle (a boilerplate n-gram
    shared by a large fraction of the corpus) concentrates its n² pair
    rows in a single hash partition and can OOM an executor. Corpora
    where that is plausible should set `max_shingle_freq` (which both
    bounds the pair blowup AND routes this function through the
    spill-safe exploded-join branch) or use the prefix-filter variant,
    the declared 100 TB path — it never joins hot shingles at all.
    """
    # the shingle frame feeds multiple plan branches; checkpoint it so
    # the tokenize+gram projection runs once (localCheckpoint blocks
    # are GC-freed; cache() entries would pile up in CacheManager
    # across calls in a long session — ADVICE r2). Round 12: the
    # checkpoint stores the ARRAY form (doc, sh, sz) — smaller blocks
    # than the exploded stream, per-doc size comes along for free, and
    # each join side re-explodes from blocks with one cheap Generate.
    # Trade-off: checkpointed blocks DROP lineage, so on a multi-
    # executor cluster an executor loss fails the job instead of
    # recomputing; a fault-tolerant deployment should swap this for
    # cache()+unpersist() or reliable checkpoint() (ADVICE r3).
    sh_arr = _shingle_arrays_materialized(df, id_col, text_col, n)
    if max_shingle_freq is not None:
        # the stop-shingle cap needs global document frequencies, so
        # this branch works on the exploded stream and recounts sizes
        # AFTER the filter (the denominator uses surviving shingles)
        sh = sh_arr.select("doc", F.explode("sh").alias("shingle"))
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_shingle_freq)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
        sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
        a = sh.select(F.col("doc").alias("doc_a"), "shingle")
        b = sh.select(F.col("doc").alias("doc_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
        sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
        joined = inter.join(sa, "doc_a").join(sb, "doc_b")
    else:
        # round 12 (guide §2.3/§2.4): per-doc set sizes RIDE THE PAIR
        # STREAM instead of joining back. sz is functionally dependent
        # on doc, so grouping by (doc, sz) pairs is the same grouping —
        # 8 extra bytes per pair row on the one unavoidable exchange
        # buys the removal of two joins plus the two size aggregates
        # that fed them (each a full pass + exchange over the shingle
        # stream; Catalyst does not CSE the sa/sb branches).
        a = sh_arr.select(
            F.col("doc").alias("doc_a"),
            F.col("sz").alias("sz_a"),
            F.explode("sh").alias("shingle"),
        )
        b = sh_arr.select(
            F.col("doc").alias("doc_b"),
            F.col("sz").alias("sz_b"),
            F.explode("sh").alias("shingle"),
        )
        # shuffled-hash, not sort-merge (guide §3.1, round 12): both
        # sides are the same exploded stream, and SMJ pays two full
        # sorts of it for a join whose per-partition build (rows /
        # shuffle.partitions) fits comfortably; measured 1.50s -> 1.14s
        # at sf0.1. Memory trade at scale: a pathological hot shingle
        # concentrates build rows where SMJ would spill — that corpus
        # should cap it with max_shingle_freq or use the prefix-filter
        # variant (the declared 100 TB path), which never joins hot
        # shingles at all.
        joined = (
            a.join(b.hint("shuffle_hash"), "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    return (
        joined.withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via prefix filtering — the
    AllPairs/PPJoin family (Bayardo et al., WWW 2007); the distributed
    layout follows Vernica/Carey/Li's MapReduce set-similarity join
    (SIGMOD 2010). Output is identical to `jaccard_pairs` (same oracle
    SQL applies); only the candidate generation changes.

    Why it's exact: for J(A,B) >= t the overlap obeys |A∩B| >= ceil(t·|A|)
    (since |A∪B| >= |A|), so if each doc's shingles are sorted by one
    GLOBAL canonical order (document frequency asc, then shingle — rarest
    first), any qualifying pair must share a shingle inside each doc's
    first |A| - ceil(t·|A|) + 1 shingles. Joining only those prefixes
    yields a candidate superset; an array-intersect verify then computes
    the true Jaccard, so no false positives survive and no true pair is
    missed.

    Why it's the scale path for EXACT dedup: the self-join cost drops
    from Σ_s df(s)² over ALL shingles to Σ over prefix shingles only —
    and because the canonical order puts rarest shingles in the prefix,
    those are precisely the shingles with the smallest df². Hot
    stop-shingles ('of the and') land outside every prefix and never
    generate a candidate, without the lossy `max_shingle_freq` cap.
    The verify step ships each candidate's shingle set once (array
    column), not one row per shingle."""
    from pyspark.sql import Window

    # Three consumers (df-counts, prefix build, verify sets): cache the
    # exploded shingles so tokenize+explode runs once.
    sh = doc_shingles(df, id_col, text_col, n).transform(barrier)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    w_rank = Window.partitionBy("doc").orderBy("df_", "shingle")
    w_doc = Window.partitionBy("doc")
    ranked = sh.join(dfreq, "shingle").select(
        "doc",
        "shingle",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_doc).alias("sz"),
    )
    prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    prefix = ranked.filter(F.col("rn") <= prefix_len).select("doc", "shingle")
    cands = (
        prefix.select(F.col("doc").alias("doc_a"), "shingle")
        .join(prefix.select(F.col("doc").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sets = sh.groupBy("doc").agg(
        F.collect_set("shingle").alias("shset"),
        F.count(F.lit(1)).alias("sz"),
    )
    pa = sets.select(
        F.col("doc").alias("doc_a"),
        F.col("shset").alias("set_a"),
        F.col("sz").alias("sz_a"),
    )
    pb = sets.select(
        F.col("doc").alias("doc_b"),
        F.col("shset").alias("set_b"),
        F.col("sz").alias("sz_b"),
    )
    return (
        cands.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures_from_shingles(
    sh: DataFrame, seeds: int = MINHASH_SEEDS
) -> DataFrame:
    """MinHash signatures from an exploded (doc, shingle) frame:
    sig_s = min over shingles of md5(s || ':' || shingle). One grouped
    aggregate with `seeds` min() columns — linear in corpus size,
    embarrassingly partition-parallel. md5 (not xxhash64) so DuckDB can
    reproduce the signatures bit-for-bit for the oracle check."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"sig{s}")
        for s in range(seeds)
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_signatures_from_arrays(
    sh_arr: DataFrame, seeds: int = MINHASH_SEEDS
) -> DataFrame:
    """MinHash signatures from the ARRAY-form shingle frame (round 12):
    sig_s = array_min(transform(sh, x -> md5(s || ':' || x))) — the
    same md5 strings and the same lexicographic min as the grouped
    form, computed row-locally inside codegen. The grouped form's
    min(string) aggregates are not hash-aggregatable (UnsafeRow agg
    buffers need fixed-width mutable types), so Spark planned a
    SortAggregate: a full sort of the exploded shingle stream on every
    consumer. The array form needs no aggregate, no sort and no
    exchange at all — per-doc work, embarrassingly parallel."""
    def sig(s: int):
        # one-parameter lambda built per seed: transform() infers HOF
        # arity from the lambda signature, so a `lambda x, s=s` closure
        # would be misread as the (element, index) form and bind the
        # seed to the index column (caught by
        # tests/test_r12_optimizations.py signature-parity pin)
        prefix = f"{s}:"
        return F.array_min(
            F.transform(F.col("sh"), lambda x: F.md5(F.concat(F.lit(prefix), x)))
        ).alias(f"sig{s}")

    return sh_arr.select(F.col("doc"), *[sig(s) for s in range(seeds)])


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, seeds: int = MINHASH_SEEDS
) -> DataFrame:
    return minhash_signatures_from_shingles(doc_shingles(df, id_col, text_col, n), seeds)


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = LSH_BANDS, seeds: int = MINHASH_SEEDS
) -> DataFrame:
    """Band the signature (rows-per-band = seeds/bands); docs sharing
    any band key become candidate pairs. The self-join is per band key —
    near-dup clusters are small, so this is near-linear."""
    rows_per_band = seeds // bands
    band_cols = []
    for b in range(bands):
        sig_slice = [F.col(f"sig{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *sig_slice)).alias("key"))
        )
    banded = signatures.select(
        F.col("doc"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # both self-join sides consume the banded frame and Catalyst does
    # not CSE them — without materialization every signature md5 (the
    # dominant per-row cost) runs twice. (doc, band, key) is 3 narrow
    # rows per doc; blocks are GC-freed (round 12, guide §2.4).
    banded = banded.transform(barrier)
    x = banded.select(F.col("doc").alias("doc_a"), "band", "key")
    y = banded.select(F.col("doc").alias("doc_b"), "band", "key")
    return (
        x.join(y, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.7,
    seeds: int = MINHASH_SEEDS,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Full MinHash→LSH→verify pipeline: signatures (linear) → band
    candidates (near-linear) → exact Jaccard only on candidates.

    Round-12 shape (guide §2.3/§2.4): the shingle sets stay IN-ROW
    (doc_shingle_arrays) — signatures are row-local array_min (no
    SortAggregate, no sort, no exchange), per-doc sizes ride the
    arrays, and the verify step attaches each candidate pair's two
    arrays and computes |A∩B| with one array_intersect per pair
    instead of a (doc, shingle) equi-join + pair groupBy + two size
    joins. The candidate frame is the output of an aggregate
    (distinct), so AQE sizes it from runtime stats and broadcasts it
    into both attach joins when it is small — at scale they degrade to
    shuffles of the candidate docs' arrays, the same bytes the old
    exploded joins moved. Old plan: 9 exchanges, 2 SortAggregate
    sorts; new plan: 4 exchanges, none (captured in plans/r12/)."""
    sh_arr = _shingle_arrays_materialized(df, id_col, text_col, n)
    sigs = minhash_signatures_from_arrays(sh_arr, seeds)
    cands = lsh_candidate_pairs(sigs, bands, seeds)
    pa = sh_arr.select(
        F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("sz").alias("sz_a")
    )
    pb = sh_arr.select(
        F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("sz").alias("sz_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cands.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        # inter > 0 restores exact parity with the replaced
        # (doc, shingle) inner-join verify, which never materialized
        # zero-overlap candidate pairs (ADVICE r12): without it a
        # threshold <= 0 would keep banding-collision pairs with
        # jaccard 0.0 that the old form dropped before its filter.
        .filter((F.col("inter") > 0) & (F.col("jaccard") >= threshold))
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(
    nodes: DataFrame, pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Near-dup clusters: connected components of the pair graph by
    iterative min-label propagation. Returns (doc, component) where
    component = the smallest doc id reachable (singletons map to
    themselves) — the canonical-representative assignment that turns
    pairwise near-dups into dedup groups.

    Each iteration is one join + one aggregate (label := min over self
    and neighbors); converges in O(diameter) iterations — near-dup
    clusters are shallow, so a handful. The driver-side loop carries
    only a changed-row count per iteration (no data). At graph scale
    this is the standard large-star/small-star layout; GraphFrames'
    Pregel is the library form.

    Every iteration ends in an EAGER localCheckpoint: without lineage
    truncation the plan nests one join deeper per iteration (analysis
    time and recovery cost grow without bound — the classic iterative-
    algorithm failure on Spark), and the eager materialization also
    means the iteration's join runs exactly once (the convergence count
    then reads materialized partitions). A production run on a lossy
    cluster would use reliable `checkpoint()` into the job's checkpoint
    dir instead — same shape, durable storage."""
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = edges.unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).distinct()
    labels = nodes.select(F.col("doc"), F.col("doc").alias("component"))
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc == neighbor_min.src, "left")
            .select(
                "doc",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.transform(barrier, eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def _bit_mask(b: int) -> int:
    return (1 << b) if b < 63 else -(1 << 63)


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    nbits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash signature as an `nbits`-char bit-string column.

    Explode tokens → hash → per-bit +1/-1 vote summed per doc (one
    shuffle, nbits aggregate columns) → sign bits concatenated. Linear,
    partition-parallel; near-dups have small Hamming distance
    (see hamming_pairs).

    hash_fn:
      - "xxhash64" (default): fastest JVM-side hash — the scale path.
      - "md5": bit b is bit (3 - b%4) of hex digit b//4 of md5(token).
        Byte-identical in DuckDB (strpos('0123456789abcdef', ...) on
        the same md5 hex string), which makes the WHOLE SimHash
        pipeline oracle-checkable — the same reproducibility trick the
        MinHash signatures use (VERDICT r1 item 5). Requires
        nbits <= 128.
    """
    from ..functions.textfns import tokens

    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    if hash_fn == "md5":
        # parse each needed hex digit ONCE per token, then vote per bit
        ndigits = (nbits + 3) // 4
        dig = toks.withColumn("h", F.md5("tok")).select(
            "doc",
            *[
                (
                    F.expr(f"instr('0123456789abcdef', substring(h, {d + 1}, 1))") - 1
                ).alias(f"d{d}")
                for d in range(ndigits)
            ],
        )
        votes = dig.groupBy("doc").agg(
            *[
                F.sum(
                    F.when(
                        F.expr(
                            f"((d{b // 4} div {1 << (3 - b % 4)}) % 2) = 1"
                        ),
                        1,
                    ).otherwise(-1)
                ).alias(f"v{b}")
                for b in range(nbits)
            ]
        )
    else:
        h = toks.withColumn("h", F.xxhash64("tok"))
        votes = h.groupBy("doc").agg(
            *[
                F.sum(
                    F.when(
                        F.col("h").bitwiseAND(F.lit(_bit_mask(b))) != 0, 1
                    ).otherwise(-1)
                ).alias(f"v{b}")
                for b in range(nbits)
            ]
        )
    bits = F.concat(
        *[F.when(F.col(f"v{b}") > 0, F.lit("1")).otherwise(F.lit("0")) for b in range(nbits)]
    )
    return votes.select("doc", bits.alias("simhash"))


def hamming_pairs(
    simhashes: DataFrame, max_distance: int = 3, prefix_bits: int = 16
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_distance.

    Blocking on the signature prefix keeps the self-join near-linear
    (near-dups share long prefixes with high probability; multi-table
    rotation blocking is the full-recall variant at scale). Distance is
    computed by summing character mismatches via zip of the two bit
    strings — built-ins only.
    """
    a = simhashes.select(
        F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a")
    ).withColumn("blk", F.substring("sh_a", 1, prefix_bits))
    b = simhashes.select(
        F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b")
    ).withColumn("blk", F.substring("sh_b", 1, prefix_bits))
    dist = F.aggregate(
        F.sequence(F.lit(1), F.length("sh_a")),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            F.col("sh_a").substr(i, F.lit(1)) != F.col("sh_b").substr(i, F.lit(1)), 1
        ).otherwise(0),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", dist)
        .filter(F.col("hamming") <= max_distance)
        .select("doc_a", "doc_b", "hamming")
    )


def substring_dup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    gram_chars: int = 32,
    anchor_window: int = 8,
) -> DataFrame:
    """Cross-document repeated-substring accounting — the char-level
    complement of the word-shingle suite (the "dedup training data at
    the substring level" idea of Lee et al., 2107.06499, made
    shuffle-friendly with content-defined sampling instead of a
    suffix array, which no shared-nothing engine builds globally).

    Gram positions are CONTENT-DEFINED, not fixed-stride: position p
    is an anchor iff the first hex digit of md5 of the `anchor_window`
    chars at p is '0' (expected gap 16). Content-defined anchors are
    alignment-independent — a span shared by two documents anchors at
    the SAME span-relative offsets in both, wherever each copy starts,
    so any shared span of length gram_chars + O(16) is detected with
    high probability. (A fixed stride-s grid only catches copies at
    equal alignment mod s — it misses an arbitrary-offset repeat.)
    Each anchor emits the md5 of the `gram_chars`-char gram starting
    there; a gram in >= 2 DISTINCT documents is "duplicated". Output
    per doc: total grams and duplicated grams — the span accounting a
    pipeline thresholds on before cutting documents.

    Scale: anchoring costs one md5 of `anchor_window` chars per
    character (JVM codegen, map-side only) and emits ~n/16 rows; the
    df(gram) group-by is the only wide op. Degenerate grams
    (whitespace runs, boilerplate) concentrate like stop-shingles — a
    df cap before the join is the production knob, same as
    `max_shingle_freq`.
    """
    grams = (
        df.filter(F.length(F.col(text_col)) >= gram_chars)
        .select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.expr(
                    f"transform("
                    f" filter(sequence(1, length({text_col}) - {gram_chars} + 1),"
                    f"  p -> substring(md5(substring({text_col}, p,"
                    f"   {anchor_window})), 1, 1) = '0'),"
                    f" p -> md5(substring({text_col}, p, {gram_chars})))"
                )
            ).alias("h"),
        )
    )
    dup = (
        grams.groupBy("h")
        .agg(F.count_distinct("doc").alias("ddf"))
        .filter(F.col("ddf") >= 2)
        .select("h")
    )
    per_doc = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    dup_per_doc = (
        grams.join(dup, "h", "left_semi")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("dup_grams"))
    )
    return (
        per_doc.join(dup_per_doc, "doc", "left")
        .select(
            F.col("doc"),
            "n_grams",
            F.coalesce(F.col("dup_grams"), F.lit(0)).alias("dup_grams"),
        )
    )
