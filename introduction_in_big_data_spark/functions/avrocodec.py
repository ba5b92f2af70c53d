"""Pure-Python Apache Avro codec — Object Container Files and the
binary encoding, from the published specification
(https://avro.apache.org/docs/1.11.1/specification/). stdlib only
(struct, zlib, json, io).

Why it exists: the image ships neither the spark-avro connector jar
nor a Python avro library, so VERDICT r1-r3 carried "Avro connector —
untestable here" as an accepted gap. The format itself is small and
public — zigzag-varint primitives, blocked arrays/maps, union-by-index,
and a container framing of sync-marker-delimited deflate/null blocks —
so, like the JPEG/PNG codecs (functions/jpegcodec.py, codecs.py), the
gap closes with an implementation instead of a jar. sources/readers
builds read_avro on top; the encoder exists so tests and plans can
STAGE real container files and round-trip them (golden-byte vectors
from the spec pin the wire format, not just self-consistency).

Supported schema forms: record, enum, fixed, array, map, union,
null/boolean/int/long/float/double/bytes/string, named-type references,
and the deflate + null codecs. Unsupported (raise clearly): snappy
codec, aliases-based schema resolution, recursive types deeper than
Python's stack.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


class AvroError(Exception):
    pass


# ---------------------------------------------------------------------------
# primitive binary encoding (spec "Binary Encoding")
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise AvroError("EOF inside varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7
        if shift > 70:
            raise AvroError("varint too long")


def write_bytes(buf: io.BytesIO, data: bytes) -> None:
    write_long(buf, len(data))
    buf.write(data)


def read_bytes(buf) -> bytes:
    n = read_long(buf)
    if n < 0:
        raise AvroError("negative byte length")
    return _read_exact(buf, n, "bytes")


def _read_exact(buf, n: int, what: str) -> bytes:
    """Read exactly n bytes or raise AvroError — truncated/corrupt
    files must surface as the module's promised EOF error, not as a
    silently short `fixed` value or an opaque struct.error."""
    data = buf.read(n)
    if len(data) != n:
        raise AvroError(f"EOF inside {what}")
    return data


# ---------------------------------------------------------------------------
# schema-driven value codec
# ---------------------------------------------------------------------------


def _resolve(schema, named: dict):
    """Normalize a schema node: strings may be primitive names OR
    references to previously-defined named types."""
    if isinstance(schema, str):
        if schema in named:
            return named[schema]
        return schema
    return schema


def _register_named(schema, named: dict) -> None:
    if isinstance(schema, dict) and schema.get("type") in (
        "record",
        "enum",
        "fixed",
    ):
        name = schema.get("name")
        if name:
            named[name] = schema
            ns = schema.get("namespace")
            if ns:
                named[f"{ns}.{name}"] = schema


def encode_value(buf: io.BytesIO, schema, value, named: dict) -> None:
    schema = _resolve(schema, named)
    if isinstance(schema, list):  # union: long index + encoded value
        for i, branch in enumerate(schema):
            b = _resolve(branch, named)
            if _matches(b, value, named):
                write_long(buf, i)
                encode_value(buf, b, value, named)
                return
        raise AvroError(f"no union branch for {value!r} in {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        if value is not None:
            raise AvroError("non-None for null type")
    elif t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        write_bytes(buf, bytes(value))
    elif t == "string":
        write_bytes(buf, value.encode("utf-8"))
    elif t == "fixed":
        data = bytes(value)
        if len(data) != schema["size"]:
            raise AvroError("fixed size mismatch")
        buf.write(data)
    elif t == "enum":
        write_long(buf, schema["symbols"].index(value))
    elif t == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                encode_value(buf, schema["items"], item, named)
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                write_bytes(buf, k.encode("utf-8"))
                encode_value(buf, schema["values"], v, named)
        write_long(buf, 0)
    elif t == "record":
        _register_named(schema, named)
        for field in schema["fields"]:
            try:
                encode_value(buf, field["type"], value[field["name"]], named)
            except KeyError as exc:
                raise AvroError(f"missing record field {field['name']}") from exc
    else:
        raise AvroError(f"unsupported schema type {t!r}")


def _matches(schema, value, named: dict) -> bool:
    schema = _resolve(schema, named)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, float) or (
            isinstance(value, int) and not isinstance(value, bool)
        )
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t == "array":
        return isinstance(value, (list, tuple))
    if t == "map":
        return isinstance(value, dict)
    if t == "record":
        return isinstance(value, dict)
    return False


def decode_value(buf, schema, named: dict):
    schema = _resolve(schema, named)
    if isinstance(schema, list):
        idx = read_long(buf)
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return decode_value(buf, schema[idx], named)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        byte = buf.read(1)
        if not byte:
            raise AvroError("EOF reading boolean")
        return byte[0] == 1
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", _read_exact(buf, 4, "float"))[0]
    if t == "double":
        return struct.unpack("<d", _read_exact(buf, 8, "double"))[0]
    if t == "bytes":
        return read_bytes(buf)
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return _read_exact(buf, schema["size"], "fixed")
    if t == "enum":
        return schema["symbols"][read_long(buf)]
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix (skippable form)
                read_long(buf)
                n = -n
            for _ in range(n):
                out.append(decode_value(buf, schema["items"], named))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = read_bytes(buf).decode("utf-8")
                out[k] = decode_value(buf, schema["values"], named)
    if t == "record":
        _register_named(schema, named)
        return {
            f["name"]: decode_value(buf, f["type"], named)
            for f in schema["fields"]
        }
    raise AvroError(f"unsupported schema type {t!r}")


# ---------------------------------------------------------------------------
# Object Container Files (spec "Object Container Files")
# ---------------------------------------------------------------------------


def write_container(
    path: str,
    schema: dict,
    rows: list[dict],
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
    block_rows: int = 1000,
) -> None:
    """Write an Avro Object Container File. `sync` is deterministic by
    default (tests and oracle staging want byte-stable files; the spec
    only requires the 16 bytes be consistent within the file)."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    named: dict = {}
    _register_named(schema, named)
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        meta_buf = io.BytesIO()
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        write_long(meta_buf, len(meta))
        for k, v in meta.items():
            write_bytes(meta_buf, k.encode())
            write_bytes(meta_buf, v)
        write_long(meta_buf, 0)
        fh.write(meta_buf.getvalue())
        fh.write(sync)
        for i in range(0, len(rows), block_rows):
            chunk = rows[i : i + block_rows]
            data = io.BytesIO()
            for row in chunk:
                encode_value(data, schema, row, named)
            raw = data.getvalue()
            if codec == "deflate":
                # spec: raw deflate stream, no zlib header/checksum
                comp = zlib.compressobj(9, zlib.DEFLATED, -15)
                raw = comp.compress(raw) + comp.flush()
            block = io.BytesIO()
            write_long(block, len(chunk))
            write_long(block, len(raw))
            fh.write(block.getvalue())
            fh.write(raw)
            fh.write(sync)


def read_container(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro Object Container File -> (writer schema, rows)."""
    with open(path, "rb") as fh:
        if fh.read(4) != MAGIC:
            raise AvroError(f"not an Avro container file: {path}")
        meta: dict[str, bytes] = {}
        while True:
            n = read_long(fh)
            if n == 0:
                break
            if n < 0:
                read_long(fh)
                n = -n
            for _ in range(n):
                k = read_bytes(fh).decode("utf-8")
                meta[k] = read_bytes(fh)
        schema = json.loads(meta["avro.schema"])
        codec = meta.get("avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise AvroError(f"unsupported codec {codec!r}")
        sync = fh.read(16)
        named: dict = {}
        _register_named(schema, named)
        rows: list[dict] = []
        while True:
            first = fh.read(1)
            if not first:
                break  # clean EOF at a block boundary
            # un-read the byte by prefixing a fresh reader
            count_buf = _Prefixed(first, fh)
            n_rows = read_long(count_buf)
            n_bytes = read_long(fh)
            raw = fh.read(n_bytes)
            if len(raw) != n_bytes:
                raise AvroError("EOF inside block")
            if codec == "deflate":
                raw = zlib.decompress(raw, -15)
            data = io.BytesIO(raw)
            for _ in range(n_rows):
                rows.append(decode_value(data, schema, named))
            if fh.read(16) != sync:
                raise AvroError("sync marker mismatch (corrupt block)")
        return schema, rows


class _Prefixed:
    """Reader that serves a prefix byte before the underlying file."""

    def __init__(self, prefix: bytes, fh):
        self._prefix = prefix
        self._fh = fh

    def read(self, n: int) -> bytes:
        if self._prefix:
            take, self._prefix = self._prefix[:n], self._prefix[n:]
            return take + self._fh.read(n - len(take))
        return self._fh.read(n)


# ---------------------------------------------------------------------------
# Spark schema mapping (for sources/readers.read_avro)
# ---------------------------------------------------------------------------

_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def avro_to_spark_ddl(schema: dict) -> str:
    """Top-level record schema -> Spark DDL string. Unions of
    ['null', T] map to nullable T; other complex fields map to their
    obvious Spark analogs; enums read as strings."""

    def one(s) -> str:
        if isinstance(s, list):
            branches = [b for b in s if b != "null"]
            if len(branches) != 1:
                raise AvroError(f"only [null, T] unions map to Spark: {s}")
            return one(branches[0])
        t = s if isinstance(s, str) else s["type"]
        if t in _TO_SPARK:
            return _TO_SPARK[t]
        if t == "enum":
            return "string"
        if t == "fixed":
            return "binary"
        if t == "array":
            return f"array<{one(s['items'])}>"
        if t == "map":
            return f"map<string,{one(s['values'])}>"
        if t == "record":
            inner = ", ".join(
                f"{f['name']}: {one(f['type'])}" for f in s["fields"]
            )
            return f"struct<{inner}>"
        raise AvroError(f"unmappable avro type {t!r}")

    if schema.get("type") != "record":
        raise AvroError("top-level schema must be a record")
    return ", ".join(f"{f['name']} {one(f['type'])}" for f in schema["fields"])


def spark_rows_to_avro(df_schema, rows) -> tuple[dict, list[dict]]:
    """Build (avro schema, row dicts) from a Spark DataFrame's schema
    and collected Rows — every field nullable via [null, T] unions,
    which is how spark-avro writes by default."""
    _FROM_SPARK = {
        "BooleanType": "boolean",
        "IntegerType": "int",
        "LongType": "long",
        "FloatType": "float",
        "DoubleType": "double",
        "BinaryType": "bytes",
        "StringType": "string",
    }

    def one(dt):
        name = type(dt).__name__
        if name in _FROM_SPARK:
            return _FROM_SPARK[name]
        if name == "ArrayType":
            return {"type": "array", "items": one(dt.elementType)}
        raise AvroError(f"unmapped Spark type {name}")

    schema = {
        "type": "record",
        "name": "topLevelRecord",
        "fields": [
            {"name": f.name, "type": ["null", one(f.dataType)]}
            for f in df_schema.fields
        ],
    }
    out = [row.asDict(recursive=True) for row in rows]
    return schema, out
