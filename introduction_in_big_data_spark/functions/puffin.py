"""Apache PUFFIN file format + Iceberg v3 DELETION-VECTOR blobs —
pure-stdlib implementation of the published specs (the same clean-room
approach as functions/avrocodec.py and functions/roaring.py: the
container image ships no Iceberg jars, so the format itself is the
interop surface).

Puffin (iceberg.apache.org/puffin-spec): a blob container —

    Magic  Blob₁ … Blobₙ  Footer
    Footer = Magic  FooterPayload  FooterPayloadSize(4B LE)
             Flags(4B)  Magic

FooterPayload is UTF-8 JSON (optionally lz4-compressed — flag bit 0;
this writer never compresses, the reader refuses compressed payloads
loudly) listing every blob: {"blobs": [{"type", "fields",
"snapshot-id", "sequence-number", "offset", "length",
"properties"}, ...], "properties": {...}}.

Deletion-vector-v1 blob (Iceberg table spec v3, "Deletion Vectors"):

    length(4B BE, of magic+vector)  magic D1 D3 39 64
    vector (64-bit roaring bitmap, "portable" serialization)
    CRC-32 of magic+vector (4B BE)

The portable 64-bit roaring serialization is EXACTLY the payload
Delta's RoaringBitmapArray wraps (8B LE bucket count, per bucket a
4B LE high key + standard 32-bit portable bitmap) — the two formats
were deliberately aligned — so this module reuses
functions/roaring.py's serializer/parser and only adds/strips Delta's
4-byte magic prefix. The v3 manifest entry carrying a DV uses
file_format PUFFIN with referenced_data_file + content_offset +
content_size_in_bytes locating the blob (sources/iceberg.py reads
them; the staging writer add_deletion_vectors emits them).
"""

from __future__ import annotations

import json
import os
import struct
import zlib

from . import roaring

MAGIC = b"PFA1"
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])


class PuffinError(Exception):
    """Malformed Puffin container or deletion-vector blob."""


def encode_deletion_vector(positions: list[int]) -> bytes:
    """Serialize sorted row positions as one deletion-vector-v1 blob
    payload (length + magic + portable-64 bitmap + CRC)."""
    # roaring.serialize_bitmap_array = Delta magic (4B LE) + portable64
    portable = roaring.serialize_bitmap_array(sorted(set(positions)))[4:]
    body = DV_MAGIC + portable
    return (
        struct.pack(">i", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def decode_deletion_vector(blob: bytes) -> list[int]:
    """Row positions from a deletion-vector-v1 blob payload; verifies
    the magic and the CRC."""
    if len(blob) < 12:
        raise PuffinError(f"deletion-vector blob too short ({len(blob)}B)")
    (body_len,) = struct.unpack_from(">i", blob, 0)
    body = blob[4 : 4 + body_len]
    if len(body) != body_len:
        raise PuffinError("deletion-vector blob truncated")
    if body[:4] != DV_MAGIC:
        raise PuffinError(
            f"bad deletion-vector magic {body[:4].hex()} "
            f"(want {DV_MAGIC.hex()})"
        )
    (crc,) = struct.unpack_from(">I", blob, 4 + body_len)
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise PuffinError("deletion-vector CRC mismatch")
    # re-wrap with Delta's magic so roaring.parse_bitmap_array decodes
    return roaring.parse_bitmap_array(
        struct.pack("<i", roaring.MAGIC) + bytes(body[4:])
    )


def write_puffin(path: str, blobs: list[dict]) -> list[tuple[int, int]]:
    """Write a Puffin file. Each blob dict: {"type": str,
    "payload": bytes, and optional "fields" (list[int]),
    "snapshot-id", "sequence-number", "properties" (dict)}.
    Returns [(offset, length)] per blob, the values a v3 manifest
    entry needs (content_offset / content_size_in_bytes)."""
    spans: list[tuple[int, int]] = []
    metas: list[dict] = []
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        for b in blobs:
            off = fh.tell()
            payload = b["payload"]
            fh.write(payload)
            spans.append((off, len(payload)))
            metas.append(
                {
                    "type": b["type"],
                    "fields": list(b.get("fields") or []),
                    "snapshot-id": int(b.get("snapshot-id") or 0),
                    "sequence-number": int(b.get("sequence-number") or 0),
                    "offset": off,
                    "length": len(payload),
                    "properties": dict(b.get("properties") or {}),
                }
            )
        footer = json.dumps({"blobs": metas, "properties": {}}).encode()
        fh.write(MAGIC)
        fh.write(footer)
        fh.write(struct.pack("<i", len(footer)))
        fh.write(struct.pack("<i", 0))  # flags: payload uncompressed
        fh.write(MAGIC)
    return spans


def read_footer(path: str) -> dict:
    """The footer payload JSON ({"blobs": [...], "properties": {...}})."""
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        if fh.read(4) != MAGIC:
            raise PuffinError(f"{path}: missing Puffin header magic")
        fh.seek(size - 4)
        if fh.read(4) != MAGIC:
            raise PuffinError(f"{path}: missing Puffin trailer magic")
        fh.seek(size - 12)
        (payload_size,) = struct.unpack("<i", fh.read(4))
        (flags,) = struct.unpack("<i", fh.read(4))
        if flags & 1:
            raise PuffinError(
                f"{path}: lz4-compressed footer payload (unsupported)"
            )
        fh.seek(size - 12 - payload_size)
        payload = fh.read(payload_size)
        # the magic BEFORE the payload closes the blob region
        fh.seek(size - 12 - payload_size - 4)
        head = fh.read(4)
        if head != MAGIC:
            raise PuffinError(f"{path}: missing footer-start magic")
    return json.loads(payload.decode())


def read_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as fh:
        fh.seek(offset)
        data = fh.read(length)
    if len(data) != length:
        raise PuffinError(f"{path}: blob at {offset} truncated")
    return data
