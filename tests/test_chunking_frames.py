"""Unit tests for document chunking (operators/chunking.py), the
incremental-dedup flag (operators/curation.incremental_dedup), and the
domain report — intended-semantics checks on hand-written fixtures, next
to the oracle-differential coverage in tests/test_oracle.py.
"""

from __future__ import annotations

import hashlib

from introduction_in_big_data_spark.operators.chunking import chunk_token_windows
from introduction_in_big_data_spark.operators.curation import (
    domain_report,
    incremental_dedup,
)
from pyspark.sql import functions as F


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_chunk_boundaries_exact(spark):
    toks = [f"t{i}" for i in range(1, 11)]  # 10 tokens
    df = spark.createDataFrame([(1, " ".join(toks))], "id_ long, text string")
    out = chunk_token_windows(df, "id_", "text", size=4, stride=3)
    got = {
        r["chunk_idx"]: (r["n_chunk_tokens"], r["chunk_fp"])
        for r in out.collect()
    }
    # starts 0,3,6,9 -> windows [0:4],[3:7],[6:10],[9:10]
    expected = {
        0: (4, _md5("t1 t2 t3 t4")),
        1: (4, _md5("t4 t5 t6 t7")),
        2: (4, _md5("t7 t8 t9 t10")),
        3: (1, _md5("t10")),
    }
    assert got == expected


def test_chunk_empty_and_whitespace_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "solo")], "id_ long, text string"
    )
    rows = chunk_token_windows(df, "id_", "text", size=4, stride=4).collect()
    assert {r["id"] for r in rows} == {3}
    assert rows[0]["n_chunk_tokens"] == 1


def test_disjoint_chunks_preserve_token_count(spark, sf_dir):
    from introduction_in_big_data_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    chunked = chunk_token_windows(d, "doc_id", "text", size=16, stride=16)
    total_chunked = chunked.agg(F.sum("n_chunk_tokens")).first()[0]
    total = d.select(
        F.sum(F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)))
    ).first()[0]
    assert total_chunked == total


def test_incremental_dedup_flags(spark):
    corpus = spark.createDataFrame(
        [(1, "The quick brown fox"), (2, "lorem ipsum dolor")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (10, "the  QUICK brown fox"),  # dup modulo case/whitespace
            (11, "entirely new material"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["is_dup"]
        for r in incremental_dedup(incoming, corpus, "text").collect()
    }
    assert out == {10: True, 11: False}


def test_domain_report_weights_and_blocklist(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/x", "one two"),
            (2, "https://a.com/y", "three"),
            (3, "https://b.net/z", "four five six"),
        ],
        "doc_id long, url string, text string",
    )
    rep = {
        r["domain"]: (r["n_docs"], r["total_weight"], r["blocked"])
        for r in domain_report(
            df, "url", F.size(F.split("text", " ")), blocklist=("b.net",)
        ).collect()
    }
    assert rep == {"a.com": (2, 3, False), "b.net": (1, 3, True)}
