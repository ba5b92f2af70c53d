"""Tests for observe-based pipeline metrics (operators/metrics.py) and
output-file-size control (sources/writers.write_parquet_sharded)."""

from __future__ import annotations

import glob
import os

from introduction_in_big_data_spark.operators.metrics import (
    observed,
    observed_rowcount,
)
from introduction_in_big_data_spark.sources.tables import load_table
from introduction_in_big_data_spark.sources.writers import write_parquet_sharded
from pyspark.sql import functions as F


def test_observed_metrics_no_extra_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    flagged, obs = observed(
        li.filter(F.col("l_quantity") > 25),
        kept=F.count(F.lit(1)),
        qty_sum=F.sum("l_quantity"),
    )
    # one action drives the pipeline AND fills the metrics
    final = flagged.groupBy("l_returnflag").count().collect()
    got = obs.get
    expect = li.filter(F.col("l_quantity") > 25).agg(
        F.count(F.lit(1)), F.sum("l_quantity")
    ).first()
    assert got["kept"] == expect[0]
    assert got["qty_sum"] == expect[1]
    assert sum(r["count"] for r in final) == got["kept"]


def test_observed_rowcount_before_after(spark, sf_dir):
    raw = load_table(spark, sf_dir, "customer")
    pre, obs_pre = observed_rowcount(raw)
    post, obs_post = observed_rowcount(pre.filter(F.col("c_acctbal") > 0))
    n_out = post.count()
    assert obs_pre.get["n_rows"] == raw.count()
    assert obs_post.get["n_rows"] == n_out
    assert obs_pre.get["n_rows"] > obs_post.get["n_rows"]


def _parquet_files(path: str) -> list[str]:
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def test_sharded_write_max_records_per_file(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    out = str(tmp_path / "capped")
    write_parquet_sharded(
        li.repartition(1), out, max_records_per_file=max(1, n // 7)
    )
    files = _parquet_files(out)
    assert len(files) >= 7  # one task still split into many files
    assert spark.read.parquet(out).count() == n


def test_sharded_write_target_files_with_partitioning(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = str(tmp_path / "parted")
    write_parquet_sharded(li, out, partition_by=["l_returnflag"], target_files=3)
    # repartitioned on the partition column: one task per hive dir -> one
    # file per directory
    for d in glob.glob(os.path.join(out, "l_returnflag=*")):
        assert len(_parquet_files(d)) == 1
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert set(back.columns) == {"l_orderkey", "l_quantity", "l_returnflag"}


def test_expect_report_counts_violations(spark):
    from introduction_in_big_data_spark.operators.quality import (
        duplicate_key_count,
        expect_report,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (2, None, 50.0),     # name null
            (3, "c", -7.0),      # below band
            (3, "d", None),      # dup key + null balance (counts as violation)
        ],
        "k long, name string, bal double",
    )
    r = expect_report(
        df,
        name_not_null=F.col("name").isNotNull(),
        bal_in_band=F.col("bal").between(0, 10),
    ).first()
    assert (r["n_rows"], r["name_not_null"], r["bal_in_band"]) == (4, 1, 3)
    assert duplicate_key_count(df, "k").first()["n_duplicate_rows"] == 1


def test_ranking_metrics_general_contract(spark):
    """ADVICE r3: (a) a PERFECT ranking with |truth| < k scores
    nDCG = 1 (ideal-DCG spans min(k, |truth|) terms, not k); (b) a
    ranked query with no truth rows still appears, with zero metrics."""
    from introduction_in_big_data_spark.operators.metrics import ranking_metrics

    truth = spark.createDataFrame(
        [(1, 101), (1, 102)], "query_id long, neighbor_id long"
    )  # |truth| = 2 < k = 5
    ranked = spark.createDataFrame(
        [(1, 101, 1), (1, 102, 2), (1, 999, 3), (1, 998, 4), (1, 997, 5),
         (2, 101, 1), (2, 102, 2)],  # query 2 has NO truth
        "query_id long, neighbor_id long, rn long",
    )
    out = {r.query_id: r for r in ranking_metrics(truth, ranked, 5).collect()}
    assert set(out) == {1, 2}
    assert out[1].ndcg == 1.0          # perfect ranking, short truth
    assert out[1].recall_at_k == 1.0
    assert out[1].mrr == 1.0
    assert out[2].n_hits == 0 and out[2].ndcg == 0.0
    assert out[2].recall_at_k == 0.0 and out[2].mrr == 0.0
