

def test_substring_dup_detects_planted_span(spark):
    """Content-defined anchoring is alignment-independent: the same
    200-char span planted at DIFFERENT offsets in two documents must
    yield duplicated grams in both; a fully distinct doc yields none."""
    import hashlib

    from introduction_in_big_data_spark.operators.dedup import substring_dup_stats

    span = "the shared boilerplate paragraph repeats verbatim in both documents " * 3
    # sanity: the span itself contains at least one anchor position
    # with room for a full 32-char gram (deterministic for this text)
    anchors = [
        i
        for i in range(len(span) - 32 + 1)
        if hashlib.md5(span[i : i + 8].encode()).hexdigest()[0] == "0"
    ]
    assert anchors, "test span must contain an anchor"

    a = "doc-a preamble " * 4 + span + " tail-of-doc-a"
    b = "b-intro " * 9 + span + " completely different ending " * 2
    c = "totally unrelated text without any common paragraph " * 6
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    got = {
        r["doc"]: (r["n_grams"], r["dup_grams"])
        for r in substring_dup_stats(df, "doc_id", "text", 32, 8).collect()
    }
    assert got[1][1] >= 1 and got[2][1] >= 1, got
    assert got[3][1] == 0
    assert all(n >= d for n, d in got.values())
