"""Pure-Python Avro codec + source/sink tests.

Golden-byte vectors come from the Avro specification's own examples
(zigzag table, the string "foo" encoding, the record/array examples in
"Binary Encoding"), so the wire format is pinned against the published
spec — not merely self-consistent round trips.
"""

from __future__ import annotations

import io

import pytest

from introduction_in_big_data_spark.functions import avrocodec as av


# -- spec golden bytes -------------------------------------------------------


@pytest.mark.parametrize(
    "value,expected",
    [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-2, b"\x03"),
        (2, b"\x04"),
        (-64, b"\x7f"),
        (64, b"\x80\x01"),
        (-8193, b"\x81\x80\x01"),
    ],
)
def test_zigzag_varint_spec_table(value, expected):
    buf = io.BytesIO()
    av.write_long(buf, value)
    assert buf.getvalue() == expected
    assert av.read_long(io.BytesIO(expected)) == value


def test_string_foo_spec_bytes():
    """Spec: the string 'foo' encodes as 06 66 6f 6f."""
    buf = io.BytesIO()
    av.encode_value(buf, "string", "foo", {})
    assert buf.getvalue() == b"\x06foo"


def test_record_spec_example():
    """Spec 'Binary Encoding' example: record {a: long, b: string}
    with {a: 27, b: 'foo'} encodes as 36 06 66 6f 6f."""
    schema = {
        "type": "record",
        "name": "test",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    buf = io.BytesIO()
    av.encode_value(buf, schema, {"a": 27, "b": "foo"}, {})
    assert buf.getvalue() == b"\x36\x06foo"
    assert av.decode_value(io.BytesIO(b"\x36\x06foo"), schema, {}) == {
        "a": 27,
        "b": "foo",
    }


def test_array_spec_example():
    """Spec: array<long> [3, 27] encodes as 04 06 36 00."""
    schema = {"type": "array", "items": "long"}
    buf = io.BytesIO()
    av.encode_value(buf, schema, [3, 27], {})
    assert buf.getvalue() == b"\x04\x06\x36\x00"
    assert av.decode_value(io.BytesIO(b"\x04\x06\x36\x00"), schema, {}) == [3, 27]


def test_union_null_string_spec_example():
    """Spec: union ['null','string'] null -> 00; 'a' -> 02 02 61."""
    schema = ["null", "string"]
    buf = io.BytesIO()
    av.encode_value(buf, schema, None, {})
    assert buf.getvalue() == b"\x00"
    buf = io.BytesIO()
    av.encode_value(buf, schema, "a", {})
    assert buf.getvalue() == b"\x02\x02a"


# -- container round trips ---------------------------------------------------

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "v", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {
            "name": "color",
            "type": {"type": "enum", "name": "c", "symbols": ["R", "G", "B"]},
        },
        {"name": "blob", "type": "bytes"},
    ],
}

ROWS = [
    {
        "k": i,
        "name": None if i % 3 == 0 else f"n{i}",
        "v": i * 1.5,
        "tags": [f"t{j}" for j in range(i % 4)],
        "props": {"a": i, "b": -i},
        "color": "RGB"[i % 3],
        "blob": bytes([i % 256, 255 - i % 256]),
    }
    for i in range(257)
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    av.write_container(p, SCHEMA, ROWS, codec=codec, block_rows=100)
    schema2, rows2 = av.read_container(p)
    assert schema2 == SCHEMA
    assert rows2 == ROWS


def test_container_detects_corruption(tmp_path):
    p = str(tmp_path / "t.avro")
    av.write_container(p, SCHEMA, ROWS[:10], codec="null")
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # flip a sync byte
    open(p, "wb").write(bytes(data))
    with pytest.raises(av.AvroError, match="sync"):
        av.read_container(p)


def test_container_rejects_unknown_codec(tmp_path):
    with pytest.raises(av.AvroError, match="codec"):
        av.write_container(str(tmp_path / "x.avro"), SCHEMA, [], codec="snappy")


# -- Spark source/sink -------------------------------------------------------


def test_spark_avro_roundtrip(spark, sf_dir, tmp_path):
    """write_avro_dir -> read_avro_dir on the customer table: content
    multiset-equal, one file per non-empty partition, one scan task
    per file."""
    from introduction_in_big_data_spark.sources.avro_io import (
        read_avro_dir,
        write_avro_dir,
    )
    from introduction_in_big_data_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    ).repartition(4)
    out = str(tmp_path / "cust_avro")
    write_avro_dir(df, out, codec="deflate")
    import os as _os

    files = [f for f in _os.listdir(out) if f.endswith(".avro")]
    assert len(files) == 4
    back = read_avro_dir(spark, out)
    assert back.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_spark_avro_null_codec_and_nulls(spark, tmp_path):
    from introduction_in_big_data_spark.sources.avro_io import (
        read_avro_dir,
        write_avro_dir,
    )

    df = spark.createDataFrame(
        [(1, None, [1.0, 2.0]), (2, "x", None)],
        "k long, s string, arr array<double>",
    )
    out = str(tmp_path / "n_avro")
    write_avro_dir(df.coalesce(1), out, codec="null")
    back = read_avro_dir(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_avro_roundtrip_property():
    """Property: arbitrary (long, double, optional-string, bytes,
    string-list) rows survive the full container round trip bit-exact
    (floats excluded from NaN since NaN != NaN)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = {
        "type": "record",
        "name": "p",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "double"},
            {"name": "c", "type": ["null", "string"]},
            {"name": "d", "type": "bytes"},
            {"name": "e", "type": {"type": "array", "items": "string"}},
        ],
    }
    row_st = st.fixed_dictionaries(
        {
            "a": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "b": st.floats(allow_nan=False),
            "c": st.none() | st.text(max_size=20),
            "d": st.binary(max_size=20),
            "e": st.lists(st.text(max_size=8), max_size=5),
        }
    )

    @settings(max_examples=50, deadline=None)
    @given(st.lists(row_st, max_size=20))
    def check(rows):
        import io as _io

        buf = _io.BytesIO()
        named = {}
        for r in rows:
            av.encode_value(buf, schema, r, named)
        buf.seek(0)
        got = [av.decode_value(buf, schema, named) for _ in rows]
        assert got == rows
        assert buf.read() == b""  # every byte consumed

    check()


def test_truncated_fixed_and_double_raise_avro_error():
    """ADVICE r4: short reads inside fixed/float/double must raise the
    promised AvroError, not return silently-short bytes or struct.error."""
    import io

    import pytest

    from introduction_in_big_data_spark.functions import avrocodec as av

    with pytest.raises(av.AvroError, match="EOF inside fixed"):
        av.decode_value(
            io.BytesIO(b"\x01\x02"),
            {"type": "fixed", "name": "f8", "size": 8},
            {},
        )
    with pytest.raises(av.AvroError, match="EOF inside double"):
        av.decode_value(io.BytesIO(b"\x01\x02\x03"), "double", {})
    with pytest.raises(av.AvroError, match="EOF inside float"):
        av.decode_value(io.BytesIO(b"\x01"), "float", {})
