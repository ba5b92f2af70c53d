"""Round-13 optimization pins.

- tfidf's tf barrier is now gated on corpus input bytes (VERDICT r12
  item 2): small file-backed corpora keep the partition-preserving
  two-scan shape, opaque/huge inputs get the single-scan barrier. The
  dispatch and the parity of both arms are pinned here.
- cf's norms localCheckpoint was reverted (VERDICT r12 item 1) — both
  arms must stay row-identical so the parameter stays safe to flip.
"""

from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import cf
from introduction_in_big_data_spark.operators.text import (
    _input_bytes,
    tfidf_top_terms,
)

DOCS = [
    (1, "alpha beta gamma alpha"),
    (2, "beta beta delta"),
    (3, "gamma delta epsilon zeta"),
    (4, "alpha alpha alpha"),
]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tfidf_auto_small_file_corpus_keeps_two_scan_shape(spark, tmp_path):
    """A small parquet-backed corpus must NOT get the tf barrier: the
    plan keeps the duplicate parquet scan and has no checkpoint
    LogicalRDD scan."""
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(p)
    d = spark.read.parquet(p)
    assert (_input_bytes(d) or 0) > 0
    out = tfidf_top_terms(d, "doc_id", "text", k=2)
    assert "ExistingRDD" not in _plan(out)


def test_tfidf_auto_opaque_input_gets_barrier(spark):
    """A frame with no file lineage (in-memory) is the scale-safe case:
    auto mode must materialize tf once (checkpoint scan in the plan)."""
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert _input_bytes(d) is None
    out = tfidf_top_terms(d, "doc_id", "text", k=2)
    assert "ExistingRDD" in _plan(out)


def test_tfidf_barrier_arms_row_identical(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = tfidf_top_terms(d, "doc_id", "text", k=2, materialize_tf=True)
    b = tfidf_top_terms(d, "doc_id", "text", k=2, materialize_tf=False)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_stream_drain_cadence_free_for_complete_agg(spark, sf_dir):
    """stream_hourly_by_type now drains uncapped (one availableNow
    batch). The drained complete-mode table must be identical to the
    1-file-per-trigger cadence it replaced — the aggregate is
    order-free by construction."""
    from introduction_in_big_data_spark.streaming import stream as st

    def drain(cap):
        s = st.events_stream(spark, sf_dir, n_files=5, max_files_per_trigger=cap)
        return st.run_to_memory(
            st.tumbling_counts(s, "ts", "1 hour", ["event_type"]),
            "complete",
            state_partitions=4,
            no_data_batches=False,
        )

    capped, uncapped = drain(1), drain(None)
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0
    assert uncapped.count() > 0


def test_lsh_pair_dedup_forms_identical(spark):
    """lsh_near_dup_pairs' minband candidate dedup (opt-in scale form)
    must produce exactly the distinct-form pair set — each pair kept
    once, at its minimum colliding band, same sims."""
    import numpy as np

    from introduction_in_big_data_spark.operators.similarity import (
        lsh_near_dup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # near-dup twin so real pairs exist
        rows.append((1000 + i, [float(x) for x in v + rng.normal(scale=1e-3, size=8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = lsh_near_dup_pairs(emb, threshold=0.8, dim=8, pair_dedup="minband")
    b = lsh_near_dup_pairs(emb, threshold=0.8, dim=8, pair_dedup="distinct")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert b.count() > 0


RATINGS = [
    (1, 10, 4.0), (1, 11, 2.0), (1, 12, 5.0),
    (2, 10, 3.0), (2, 11, 1.0), (2, 13, 4.0),
    (3, 10, 5.0), (3, 12, 2.0), (3, 13, 3.0),
    (4, 11, 4.0), (4, 12, 4.0), (4, 13, 4.0),
]


def test_cf_norms_barrier_arms_row_identical(spark):
    """materialize_norms=True (the reverted r12 barrier) and the new
    default False must produce identical similarity rows."""
    r = spark.createDataFrame(RATINGS, "user_id long, item_id long, rating double")
    a = cf.user_cosine_similarities_pruned(r, min_overlap=2, materialize_norms=True)
    b = cf.user_cosine_similarities_pruned(r, min_overlap=2, materialize_norms=False)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert b.count() > 0


def test_barrier_modes(spark, tmp_path, monkeypatch):
    """session.barrier is the single materialization-barrier choke
    point (VERDICT r12 item 5): every mode must return the same rows,
    'reliable' must demand a checkpoint dir, unknown modes must raise."""
    import pytest

    from introduction_in_big_data_spark.session import barrier

    df = spark.range(8).selectExpr("id", "id * 3 AS v")
    rows = sorted(map(tuple, df.collect()))

    monkeypatch.setenv("SPARK_GRAFT_BARRIER", "none")
    assert barrier(df) is df
    monkeypatch.setenv("SPARK_GRAFT_BARRIER", "local")
    assert sorted(map(tuple, barrier(df).collect())) == rows
    monkeypatch.setenv("SPARK_GRAFT_BARRIER", "cache")
    b = barrier(df, eager=True)
    assert sorted(map(tuple, b.collect())) == rows
    b.unpersist()
    monkeypatch.setenv("SPARK_GRAFT_BARRIER", "reliable")
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        with pytest.raises(ValueError, match="checkpoint dir"):
            barrier(df)
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "ckpt"))
    assert sorted(map(tuple, barrier(df, eager=True).collect())) == rows
    monkeypatch.setenv("SPARK_GRAFT_BARRIER", "bogus")
    with pytest.raises(ValueError, match="bogus"):
        barrier(df)


def test_cf_exact_norms_no_checkpoint_scan(spark, tmp_path):
    """The exact path's plan must not contain a checkpoint scan for the
    norms frame anymore (the revert is structural, not just timing).
    Parquet-backed input so the only possible ExistingRDD scan would be
    a checkpoint."""
    p = str(tmp_path / "ratings.parquet")
    spark.createDataFrame(
        RATINGS, "user_id long, item_id long, rating double"
    ).write.parquet(p)
    out = cf.user_cosine_similarities(spark.read.parquet(p))
    assert "ExistingRDD" not in _plan(out)
