"""Hypothesis property tests: engine operators vs plain-Python
reference implementations on arbitrary small inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import timeseries
from introduction_in_big_data_spark.operators.clean import sigma_band_filter

_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 10_000)), min_size=1, max_size=60
)


def _py_sessionize(rows, gap):
    """Plain-Python reference: session ids per key over sorted ts."""
    out = {}
    by_key: dict[int, list[int]] = {}
    for k, ts in rows:
        by_key.setdefault(k, []).append(ts)
    for k, tss in by_key.items():
        sid = 0
        prev = None
        for t_ in sorted(tss):
            if prev is None or t_ - prev > gap:
                sid += 1
            out.setdefault(k, []).append((t_, sid))
            prev = t_
    return {k: sorted(v) for k, v in out.items()}


@given(_events, st.integers(1, 500))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sessionize_matches_python_reference(spark, rows, gap):
    # dedupe (key, ts) pairs: ties in ts within a key make session
    # assignment order-dependent in both implementations equally, but
    # comparing per-(k, ts) needs uniqueness
    rows = list({(k, ts) for k, ts in rows})
    df = spark.createDataFrame(
        [(k, ts) for k, ts in rows], "k int, ep long"
    ).withColumn("ts", F.timestamp_seconds("ep"))
    got_df = timeseries.sessionize(df, "k", "ts", gap)
    got: dict[int, list] = {}
    for r in got_df.collect():
        got.setdefault(r["k"], []).append((r["ep"], r["session_id"]))
    got = {k: sorted(v) for k, v in got.items()}
    assert got == _py_sessionize(rows, gap)


@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=2, max_size=50),
    st.floats(0.5, 4.0),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sigma_band_matches_python_reference(spark, values, nsig):
    import statistics

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, v double")
    kept = {r["i"] for r in sigma_band_filter(df, "v", nsig).collect()}
    m = statistics.fmean(values)
    s = statistics.stdev(values)
    expected = {
        i for i, v in enumerate(values) if not (v > m + nsig * s or v < m - nsig * s)
    }
    assert kept == expected
