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


_vectors = st.lists(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
            width=32,  # float32 like the embedding column
        ),
        min_size=4,
        max_size=4,
    ),
    min_size=1,
    max_size=8,
)


@given(_vectors)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sq8_roundtrip_bound_matches_python_reference(spark, vecs):
    """SQ8 engine encode/decode vs a plain-Python reference: identical
    scales and codes, and |v - v̂| <= scale/2 element-wise on ANY
    float32 input (including zero vectors and extreme magnitudes)."""
    from introduction_in_big_data_spark.operators import quantize

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    got = {
        r.vec_id: (r.scale, list(r.codes), list(r.dequant))
        for r in quantize.sq8_decode(quantize.sq8_encode(df)).collect()
    }
    import struct as _struct

    for i, v in enumerate(vecs):
        v32 = [_struct.unpack("f", _struct.pack("f", x))[0] for x in v]
        scale = max(abs(x) for x in v32) / 127.0
        if scale == 0.0:
            codes = [0] * len(v32)
        else:
            # Java HALF_UP == Python ROUND_HALF_UP on positive/negative
            # ties; Decimal(repr(...)) mirrors BigDecimal.valueOf's
            # shortest-round-trip decimalization of the double (exact
            # binary expansion could fall on the other side of a .5
            # boundary than the shortest repr both JVMs round from)
            import decimal

            codes = [
                int(
                    decimal.Decimal(repr(x / scale)).quantize(
                        0, rounding=decimal.ROUND_HALF_UP
                    )
                )
                for x in v32
            ]
        g_scale, g_codes, g_deq = got[i]
        assert g_scale == scale
        assert g_codes == codes
        for x, xh in zip(v32, g_deq):
            assert abs(x - xh) <= scale / 2 + 1e-9 * max(1.0, abs(x))
