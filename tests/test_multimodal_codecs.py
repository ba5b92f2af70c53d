"""Golden-byte tests for the stdlib media codecs (functions/codecs.py)
— decoders are checked against HAND-WRITTEN container bytes, not just
our own encoder's output, so encoder and decoder cannot share a bug.
The Spark-side round trips are covered by the oracle-checked
multimodal_bmp_stats / multimodal_wav_energy queries."""

from __future__ import annotations

import struct

import pytest

from introduction_in_big_data_spark.functions import codecs

# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

# 2x2 24-bit BMP, gray pixels top-down [[10, 20], [30, 40]]:
# stored bottom-up, row stride padded 6 -> 8 bytes.
GOLDEN_BMP = (
    b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
    + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0)
    + bytes([30, 30, 30, 40, 40, 40, 0, 0])  # bottom row first
    + bytes([10, 10, 10, 20, 20, 20, 0, 0])
)


def test_decode_bmp_golden_bytes():
    w, h, rows = codecs.decode_bmp(GOLDEN_BMP)
    assert (w, h) == (2, 2)
    assert rows == [[(10, 10, 10), (20, 20, 20)], [(30, 30, 30), (40, 40, 40)]]


def test_encode_bmp_matches_golden():
    assert codecs.encode_bmp(2, 2, [[10, 20], [30, 40]]) == GOLDEN_BMP


def test_decode_bmp_top_down_storage():
    # negative height = top-down row order; decoder must NOT flip
    blob = (
        b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, 16, 0, 0, 0, 0)
        + bytes([10, 10, 10, 20, 20, 20, 0, 0])  # top row first
        + bytes([30, 30, 30, 40, 40, 40, 0, 0])
    )
    _, _, rows = codecs.decode_bmp(blob)
    assert rows[0][0] == (10, 10, 10) and rows[1][1] == (40, 40, 40)


def test_decode_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"PNG....not-a-bmp....." + b"\x00" * 60)


def test_bmp_roundtrip_odd_width_padding():
    # width 3 -> row stride 12 (9 + 3 pad): padding arithmetic exercised
    rows = [[1, 2, 3], [4, 5, 6]]
    w, h, out = codecs.decode_bmp(codecs.encode_bmp(3, 2, rows))
    assert (w, h) == (3, 2)
    assert [[px[0] for px in row] for row in out] == rows


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

GOLDEN_SAMPLES = [0, 1000, -1000, 32767, -32768]
GOLDEN_WAV = (
    b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + 10) + b"WAVE"
    + b"fmt " + struct.pack("<I", 16)
    + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    + b"data" + struct.pack("<I", 10)
    + struct.pack("<5h", *GOLDEN_SAMPLES)
)


def test_decode_wav_golden_bytes():
    rate, samples = codecs.decode_wav(GOLDEN_WAV)
    assert rate == 8000
    assert samples == GOLDEN_SAMPLES


def test_encode_wav_matches_golden():
    assert codecs.encode_wav(GOLDEN_SAMPLES, 8000) == GOLDEN_WAV


def test_decode_wav_walks_unknown_chunks():
    # a LIST chunk (odd length -> word-aligned pad) before fmt/data
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    body = (
        extra
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
        + b"data" + struct.pack("<I", 4) + struct.pack("<2h", 7, -7)
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, samples = codecs.decode_wav(blob)
    assert rate == 44100 and samples == [7, -7]


def test_decode_wav_rejects_stereo():
    body = (
        b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", 0)
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError):
        codecs.decode_wav(blob)


# ---------------------------------------------------------------------------
# PPM
# ---------------------------------------------------------------------------


def test_decode_ppm_golden_bytes_with_comment():
    blob = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    w, h, rows = codecs.decode_ppm(blob)
    assert (w, h) == (2, 1)
    assert rows == [[(1, 2, 3), (4, 5, 6)]]


def test_ppm_roundtrip():
    rows = [[(9, 8, 7)], [(1, 2, 3)]]
    assert codecs.decode_ppm(codecs.encode_ppm(1, 2, rows)) == (1, 2, rows)


# ---------------------------------------------------------------------------
# property tests: roundtrip over arbitrary shapes/values
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st_


@settings(max_examples=25, deadline=None)
@given(
    w=st_.integers(min_value=1, max_value=9),
    h=st_.integers(min_value=1, max_value=9),
    data=st_.data(),
)
def test_bmp_roundtrip_property(w, h, data):
    rows = [
        [data.draw(st_.integers(min_value=0, max_value=255)) for _ in range(w)]
        for _ in range(h)
    ]
    dw, dh, out = codecs.decode_bmp(codecs.encode_bmp(w, h, rows))
    assert (dw, dh) == (w, h)
    assert [[px[0] for px in row] for row in out] == rows
    assert all(px[0] == px[1] == px[2] for row in out for px in row)


@settings(max_examples=25, deadline=None)
@given(
    samples=st_.lists(
        st_.integers(min_value=-32768, max_value=32767), min_size=0, max_size=64
    ),
    rate=st_.sampled_from([8000, 16000, 44100, 48000]),
)
def test_wav_roundtrip_property(samples, rate):
    got_rate, got = codecs.decode_wav(codecs.encode_wav(samples, rate))
    assert got_rate == rate and got == samples


@settings(max_examples=25, deadline=None)
@given(
    w=st_.integers(min_value=1, max_value=6),
    h=st_.integers(min_value=1, max_value=6),
    data=st_.data(),
)
def test_ppm_roundtrip_property(w, h, data):
    rows = [
        [
            tuple(data.draw(st_.integers(min_value=0, max_value=255)) for _ in range(3))
            for _ in range(w)
        ]
        for _ in range(h)
    ]
    assert codecs.decode_ppm(codecs.encode_ppm(w, h, rows)) == (w, h, rows)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _golden_png(idat_split: bool = False) -> bytes:
    """Hand-constructed 2x2 RGB PNG (filter 0 scanlines) — built with
    struct+zlib directly, NOT via codecs.encode_png, so encoder and
    decoder cannot share a bug."""
    import zlib

    raw = (
        b"\x00" + bytes([10, 20, 30, 40, 50, 60])
        + b"\x00" + bytes([70, 80, 90, 100, 110, 120])
    )
    comp = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    if idat_split:
        mid = len(comp) // 2
        idat = _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
    else:
        idat = _chunk(b"IDAT", comp)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        # ancillary chunk the decoder must skip
        + _chunk(b"tEXt", b"Comment\x00golden")
        + idat
        + _chunk(b"IEND", b"")
    )


GOLDEN_PNG_PIXELS = [
    [(10, 20, 30), (40, 50, 60)],
    [(70, 80, 90), (100, 110, 120)],
]


def test_decode_png_golden_bytes():
    w, h, rows = codecs.decode_png(_golden_png())
    assert (w, h) == (2, 2)
    assert rows == GOLDEN_PNG_PIXELS


def test_decode_png_split_idat_and_ancillary_chunks():
    w, h, rows = codecs.decode_png(_golden_png(idat_split=True))
    assert (w, h) == (2, 2)
    assert rows == GOLDEN_PNG_PIXELS


def test_decode_png_rejects_bad_crc():
    blob = bytearray(_golden_png())
    blob[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(blob))


def test_decode_png_rejects_non_png():
    with pytest.raises(ValueError):
        codecs.decode_png(GOLDEN_BMP)


def test_encode_png_exercises_all_five_filters():
    import zlib

    # 6 rows -> filter bytes 0,1,2,3,4,0 in the raw scanline stream
    rows = [[(x * 40 % 256, y * 40 % 256, (x + y) % 256) for x in range(4)] for y in range(6)]
    blob = codecs.encode_png(4, 6, rows)
    # pull the IDAT payload back out and check the filter byte per row
    pos = 8
    idat = b""
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        if blob[pos + 4 : pos + 8] == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 1 + 4 * 3
    assert [raw[y * stride] for y in range(6)] == [0, 1, 2, 3, 4, 0]
    assert codecs.decode_png(blob)[2] == rows


@settings(max_examples=25, deadline=None)
@given(
    w=st_.integers(min_value=1, max_value=7),
    h=st_.integers(min_value=1, max_value=8),
    data=st_.data(),
)
def test_png_roundtrip_property(w, h, data):
    rows = [
        [
            tuple(data.draw(st_.integers(0, 255)) for _ in range(3))
            for _ in range(w)
        ]
        for _ in range(h)
    ]
    got_w, got_h, got_rows = codecs.decode_png(codecs.encode_png(w, h, rows))
    assert (got_w, got_h) == (w, h)
    assert got_rows == rows
