"""RoaringBitmapArray / Z85 codec tests (Delta deletion vectors).

The Z85 vector is the ZeroMQ RFC 32 spec example; roaring parsing is
pinned by write→parse round-trips across all container regimes plus a
hand-crafted run-container blob (the reader must handle runs even
though the staging writer never emits them).
"""

from __future__ import annotations

import struct

import pytest

from introduction_in_big_data_spark.functions import roaring as rb


def test_z85_spec_vector():
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert rb.z85_encode(data) == "HelloWorld"
    assert rb.z85_decode("HelloWorld") == data


def test_z85_rejects_bad_input():
    with pytest.raises(rb.DeletionVectorError):
        rb.z85_encode(b"abc")  # not a multiple of 4
    with pytest.raises(rb.DeletionVectorError):
        rb.z85_decode("abcd")  # not a multiple of 5
    with pytest.raises(rb.DeletionVectorError):
        rb.z85_decode('abcd"')  # invalid character


@pytest.mark.parametrize(
    "values",
    [
        [],
        [0],
        [0, 1, 2, 65535, 65536, 70000],          # two array containers
        list(range(5000)),                        # bitmap container
        [7, (1 << 32) + 7, (5 << 32) + 123456],   # multiple 64-bit buckets
        list(range(0, 200000, 3)),                # mixed containers
    ],
)
def test_bitmap_array_roundtrip(values):
    data = rb.serialize_bitmap_array(values)
    assert rb.parse_bitmap_array(data) == sorted(set(values))


def test_parse_run_container():
    """Hand-craft a run-cookie bitmap: one container with runs
    [5..9] and [100..100] — the reader must expand runs it never
    writes itself."""
    container = struct.pack("<H", 2) + struct.pack("<HH", 5, 4) + struct.pack(
        "<HH", 100, 0
    )
    rb32 = (
        struct.pack("<i", (0 << 16) | 12347)  # run cookie, 1 container
        + b"\x01"                              # run flag bitset: container 0 runs
        + struct.pack("<HH", 0, 5)             # key 0, cardinality-1 = 5
        + container                            # no offsets (n < 4)
    )
    blob = struct.pack("<iQ", rb.MAGIC, 1) + struct.pack("<I", 0) + rb32
    assert rb.parse_bitmap_array(blob) == [5, 6, 7, 8, 9, 100]


def test_dv_file_framing_and_checksum(tmp_path):
    p = str(tmp_path / "dv.bin")
    d1 = rb.serialize_bitmap_array([1, 2, 3])
    d2 = rb.serialize_bitmap_array([10])
    offsets = rb.write_dv_file(p, [d1, d2])
    assert rb.read_dv_data(p, offsets[0]) == d1
    assert rb.read_dv_data(p, offsets[1]) == d2
    # corrupt one payload byte -> checksum mismatch
    with open(p, "r+b") as fh:
        fh.seek(offsets[0] + 4 + 2)
        fh.write(b"\xff")
    with pytest.raises(rb.DeletionVectorError, match="checksum"):
        rb.read_dv_data(p, offsets[0])


def test_bad_magic_and_version(tmp_path):
    with pytest.raises(rb.DeletionVectorError, match="magic"):
        rb.parse_bitmap_array(struct.pack("<iQ", 123, 0) + b"\x00" * 4)
    p = str(tmp_path / "dv2.bin")
    with open(p, "wb") as fh:
        fh.write(b"\x02" + b"\x00" * 16)
    with pytest.raises(rb.DeletionVectorError, match="version"):
        rb.read_dv_data(p, 1)


# -- puffin deletion-vector blobs (round 8) ---------------------------------


def test_puffin_dv_blob_property_roundtrip():
    """Property: any position set round-trips through the
    deletion-vector-v1 blob encoding (length+magic+portable64+CRC)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from introduction_in_big_data_spark.functions import puffin

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**40),
            min_size=0,
            max_size=400,
        )
    )
    def check(positions):
        blob = puffin.encode_deletion_vector(positions)
        assert puffin.decode_deletion_vector(blob) == sorted(
            set(positions)
        )

    check()


def test_puffin_container_many_blobs(tmp_path):
    from introduction_in_big_data_spark.functions import puffin

    p = str(tmp_path / "many.puffin")
    sets = [list(range(i, 1000, i + 1)) for i in range(20)]
    spans = puffin.write_puffin(
        p,
        [
            {"type": "deletion-vector-v1",
             "payload": puffin.encode_deletion_vector(s)}
            for s in sets
        ],
    )
    footer = puffin.read_footer(p)
    assert len(footer["blobs"]) == 20
    for s, (off, ln) in zip(sets, spans):
        assert puffin.decode_deletion_vector(
            puffin.read_blob(p, off, ln)
        ) == sorted(set(s))
