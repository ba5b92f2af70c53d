"""Round-12 optimization pins: the restructured operator internals
must stay semantically identical to the forms they replaced, and the
plan properties the optimizations bought must not silently regress.
"""

from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import dedup
from introduction_in_big_data_spark.streaming import stream as st

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "completely different text with many unique words here"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (5, "short"),  # < n tokens: no shingles — must vanish everywhere
    (6, ""),  # empty text
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_array_signatures_match_grouped_signatures(spark):
    """The row-local array_min(transform(md5)) signatures must be
    row-identical to the grouped min(md5) aggregate they replaced —
    same docs (empties dropped), same 9 hex strings per doc."""
    d = _docs(spark)
    grouped = dedup.minhash_signatures(d, "doc_id", "text", n=3)
    arrays = dedup.minhash_signatures_from_arrays(
        dedup._shingle_arrays_materialized(d, "doc_id", "text", n=3)
    )
    g = {r["doc"]: tuple(r[f"sig{s}"] for s in range(9)) for r in grouped.collect()}
    a = {r["doc"]: tuple(r[f"sig{s}"] for s in range(9)) for r in arrays.collect()}
    assert g == a
    assert 5 not in a and 6 not in a  # shingle-less docs emit nothing


def test_minhash_plan_has_no_sort_aggregate(spark):
    """The optimization's plan property: signature computation must
    stay row-local — no SortAggregate (the min-over-string fallback)
    anywhere in the MinHash pipeline."""
    d = _docs(spark)
    out = dedup.minhash_lsh_dedup(d, "doc_id", "text", n=3, threshold=0.7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan


def test_jaccard_sz_carried_matches_join_form(spark):
    """Sizes riding the pair stream (functionally dependent grouping
    columns) must reproduce the size-join form exactly — including
    the filtered max_shingle_freq branch, which still joins."""
    d = _docs(spark)
    fast = dedup.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.1)
    # the max_shingle_freq branch keeps the original exploded shape;
    # a cap high enough to keep every shingle makes it a reference
    # implementation of the same result
    ref = dedup.jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.1, max_shingle_freq=10**6
    )
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    got = {key(r): r["jaccard"] for r in fast.collect()}
    want = {key(r): r["jaccard"] for r in ref.collect()}
    assert got == want
    assert (1, 4) in got and got[(1, 4)] == 1.0


def test_minhash_array_verify_matches_reference_jaccard(spark):
    """array_intersect candidate verification must compute the same
    Jaccard values the join+count verify produced: every emitted pair
    must carry the exact-Jaccard value of the reference pair set."""
    d = _docs(spark)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_dedup(
            d, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    # LSH emits a subset of the exact pairs, with identical values
    assert pairs, "expected at least the exact-dup pair"
    for k, v in pairs.items():
        assert exact[k] == v
    assert pairs[(1, 4)] == 1.0


def test_no_data_batch_skip_preserves_complete_mode_result(spark, tmp_path):
    """run_to_memory(no_data_batches=False) must drain a watermark-free
    complete-mode aggregation to the identical table the default
    (trailing no-data batch) produces."""
    src = str(tmp_path / "files")
    for i in range(3):
        spark.createDataFrame(
            [(i * 10 + j, f"t{j % 2}") for j in range(10)], "id long, k string"
        ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain(ndb):
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = s.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
        return {
            r["k"]: r["cnt"]
            for r in st.run_to_memory(
                agg, "complete", no_data_batches=ndb
            ).collect()
        }

    assert drain(False) == drain(None) == {"t0": 15, "t1": 15}
