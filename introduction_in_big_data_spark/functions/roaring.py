"""RoaringBitmapArray + Z85 codecs for Delta Lake deletion vectors —
pure stdlib (struct, zlib), from the published specifications:

- Delta PROTOCOL.md "Deletion Vectors": a DV is a set of 64-bit row
  indexes serialized as a RoaringBitmapArray — a 4-byte little-endian
  magic number 1681511377 followed by the 64-bit "portable" roaring
  format (uint64 LE bucket count, then per bucket: uint32 LE key +
  one standard 32-bit roaring bitmap; a value is
  (key << 32) | value32). On disk a DV lives in a `.bin` file that
  starts with a 1-byte format version (1); the add action's `offset`
  points at <dataSize: int32 BE><data><checksum: int32 BE CRC-32 of
  data>. Inline DVs ('i' storage) carry `data` Z85-encoded directly
  in the action. UUID-based paths ('u' storage) are
  <optional prefix><20-char Z85 of the 16-byte UUID>, resolving to
  <table>/<prefix>/deletion_vector_<uuid>.bin.
- RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec), the
  32-bit portable format: cookie 12346 (no runs, + int32 container
  count) or 12347 (runs, count-1 in the cookie's upper 16 bits + a
  run-flag bitset), (key, cardinality-1) descriptive headers, optional
  offset table (ignored — containers parse sequentially), then array
  (uint16 values), bitmap (1024 x uint64) or run (uint16 pairs)
  containers.
- Z85 (ZeroMQ RFC 32): 4 bytes -> 5 chars, big-endian base 85.

The WRITER side (serialize/encode/file layout) exists to STAGE
deletion vectors for tests and the registered query; the reader is
the interop claim. Like functions/avrocodec.py, the gap a missing jar
left ("deletion vectors refused") closes with the published format.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = 1681511377

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


class DeletionVectorError(Exception):
    pass


# ---------------------------------------------------------------------------
# Z85
# ---------------------------------------------------------------------------


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise DeletionVectorError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise DeletionVectorError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            if c not in _Z85_INDEX:
                raise DeletionVectorError(f"invalid z85 character {c!r}")
            n = n * 85 + _Z85_INDEX[c]
        if n > 0xFFFFFFFF:
            raise DeletionVectorError("z85 chunk overflows 4 bytes")
        out += n.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# 32-bit roaring bitmap (portable format) — reader
# ---------------------------------------------------------------------------

_COOKIE_RUN = 12347
_COOKIE_NO_RUN = 12346


def _parse_rb32(buf: memoryview, pos: int) -> tuple[list[int], int]:
    """Parse one 32-bit portable roaring bitmap at buf[pos:]; return
    (sorted values, next position)."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        flag_bytes = (n + 7) // 8
        run_flags = bytes(buf[pos : pos + flag_bytes])
        pos += flag_bytes
        has_offsets = n >= 4
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise DeletionVectorError(f"bad roaring cookie {cookie}")
    headers = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        headers.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * n  # offset table; containers parse sequentially
    values: list[int] = []
    for i, (key, card) in enumerate(headers):
        base = key << 16
        if run_flags[i // 8] & (1 << (i % 8)):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start, base + start + length + 1))
        elif card > 4096:  # bitmap container: 1024 x uint64 bitset
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
        else:  # array container
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
    return values, pos


def parse_bitmap_array(data: bytes) -> list[int]:
    """Decode a serialized RoaringBitmapArray (Delta's DV payload)
    into the sorted list of 64-bit row indexes."""
    buf = memoryview(data)
    if len(data) < 12:
        raise DeletionVectorError("deletion vector payload too short")
    (magic,) = struct.unpack_from("<i", buf, 0)
    if magic != MAGIC:
        raise DeletionVectorError(f"bad DV magic {magic} (want {MAGIC})")
    (n_buckets,) = struct.unpack_from("<Q", buf, 4)
    pos = 12
    out: list[int] = []
    for _ in range(n_buckets):
        (key,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        vals, pos = _parse_rb32(buf, pos)
        out.extend((key << 32) | v for v in vals)
    return out


# ---------------------------------------------------------------------------
# writer (staging) — arrays and bitmap containers, no runs
# ---------------------------------------------------------------------------


def _serialize_rb32(values: list[int]) -> bytes:
    """Standard no-run portable serialization of a 32-bit bitmap."""
    containers: dict[int, list[int]] = {}
    for v in sorted(values):
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<ii", _COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset table (required by the no-run cookie)
    offset = len(out) + 4 * len(keys)
    for k in keys:
        out += struct.pack("<I", offset)
        offset += (
            8192 if len(containers[k]) > 4096 else 2 * len(containers[k])
        )
    for k in keys:
        vals = containers[k]
        if len(vals) > 4096:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            out += struct.pack("<1024Q", *words)
        else:
            out += struct.pack(f"<{len(vals)}H", *vals)
    return bytes(out)


def serialize_bitmap_array(values: list[int]) -> bytes:
    buckets: dict[int, list[int]] = {}
    for v in sorted(values):
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iQ", MAGIC, len(buckets)))
    for key in sorted(buckets):
        out += struct.pack("<I", key)
        out += _serialize_rb32(buckets[key])
    return bytes(out)


# ---------------------------------------------------------------------------
# DV blob access (the on-disk .bin framing)
# ---------------------------------------------------------------------------


def read_dv_data(path: str, offset: int) -> bytes:
    """Read one DV's payload from a .bin file: version byte 1 at the
    file start; at `offset`, <dataSize int32 BE><data><CRC-32 int32 BE
    of data>."""
    with open(path, "rb") as fh:
        version = fh.read(1)
        if version != b"\x01":
            raise DeletionVectorError(
                f"unsupported DV file version {version!r} in {path}"
            )
        fh.seek(offset)
        raw = fh.read(4)
        if len(raw) != 4:
            raise DeletionVectorError("EOF reading DV length")
        (size,) = struct.unpack(">i", raw)
        data = fh.read(size)
        if len(data) != size:
            raise DeletionVectorError("EOF inside DV data")
        raw = fh.read(4)
        if len(raw) != 4:
            raise DeletionVectorError("EOF reading DV checksum")
        (crc,) = struct.unpack(">I", raw)
        if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            raise DeletionVectorError(f"DV checksum mismatch in {path}")
        return data


def write_dv_file(path: str, payloads: list[bytes]) -> list[int]:
    """Stage a DV .bin file holding one blob per payload; returns each
    payload's offset (for the add action's deletionVector.offset)."""
    offsets = []
    with open(path, "wb") as fh:
        fh.write(b"\x01")
        pos = 1
        for data in payloads:
            offsets.append(pos)
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            pos += 8 + len(data)
    return offsets


def positions_from_descriptor(
    storage: str, payload: str, bin_path: str, offset: int, size: int
) -> list[int]:
    """Decode a deletionVector descriptor into row indexes.
    `bin_path` is the pre-resolved filesystem path for 'u'/'p'
    storage ('' for inline); `payload` is pathOrInlineDv. Inline data
    is zero-padded to Z85's 4-byte alignment — `size` (the action's
    sizeInBytes) recovers the true length."""
    if storage == "i":
        data = z85_decode(payload)
        return parse_bitmap_array(data[:size] if size > 0 else data)
    return parse_bitmap_array(read_dv_data(bin_path, offset))
