"""Iceberg PARTITION TRANSFORMS: spec-conformant partition values on
write, transform-aware file pruning on read.

Iceberg hides physical partitioning behind *transforms* (spec
"Partition Transforms"): a partition spec maps source columns through
`identity`, `bucket[N]`, `truncate[W]`, `year`, `month`, `day`, and
each data file records its derived partition tuple in its manifest
entry. Scan planning prunes files in the PARTITION domain — the query
predicate is on the source column, the file metadata is the
transformed value, and the spec defines exactly which residuals each
transform supports:

- `identity` — the partition value IS the column value; every
  predicate evaluates exactly.
- order-preserving transforms (`truncate`, `year`, `month`, `day`) —
  v1 <= v2 implies T(v1) <= T(v2), so range predicates map to
  *inclusive* range predicates on the transformed literal
  (`col < lit` can only prune to `T(col) <= T(lit)` because distinct
  source values share a transformed value).
- `bucket[N]` — murmur3-based, order-destroying: only `=` / `in`
  (and the null checks) prune; ranges keep every file.

The bucket hash is pinned by the spec (Appendix B "32-bit Hash
Requirements"): Murmur3 x86 32-bit, **seed 0**, over the single-value
binary form — 8-byte little-endian for int/long/date(days),
raw UTF-8 for strings. Spark's builtin `F.hash` is murmur3 with seed
42, so it canNOT produce spec buckets; the write path computes them in
an Arrow-batched pandas UDF (numpy-vectorized for 64-bit keys, a
per-unique-value loop for strings — bucket inputs are join keys, so
the unique count per batch is bounded in practice). Golden hash values
from the spec's own table are pinned in tests/test_iceberg_partitions.

Reference parity: the reference has no partitioning at all (whole-file
CSV reads, Part_A_Q1.py:21); this module is part of the
beyond-reference lakehouse surface. At 100 TB partition pruning is the
difference between a metadata-only scan plan (O(#files) driver work)
and opening every parquet footer.
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass
from typing import Any

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = _dt.date(1970, 1, 1)

_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Murmur3 x86 32-bit of `data`, returned as a SIGNED int32 (the
    spec's hash results are signed). Public-domain algorithm (Austin
    Appleby), restated; Iceberg pins seed 0."""
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n & ~3
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * _C1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * _C2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * _C2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h & 0x80000000 else h


def _murmur3_long_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32(little-endian 8 bytes of int64, seed
    0) — the spec's hashLong. Two 4-byte blocks (low word first = the
    little-endian byte order), all lane math in wrapping uint32."""
    # view the forced-little-endian buffer as uint32 pairs: low word =
    # even lanes, high = odd. (uint64-scalar ops like `u & 0xFFFFFFFF`
    # fall off numpy's fast path — 300x slower than this view.)
    w = np.ascontiguousarray(v.astype("<i8")).view(np.uint32)
    h = np.zeros(len(v), dtype=np.uint32)
    c1 = np.uint32(_C1)
    c2 = np.uint32(_C2)
    for k in (w[0::2].copy(), w[1::2].copy()):
        k = k * c1
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * c2
        h ^= k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h ^= np.uint32(8)  # length
    h ^= h >> np.uint32(16)
    h = h * np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h = h * np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h.view(np.int32)


def bucket_of(value: Any, n: int) -> int | None:
    """The spec bucket of a Python literal: int/long and dates hash as
    8-byte little-endian longs (dates via days-from-epoch), strings as
    UTF-8 bytes; `(hash & Integer.MAX_VALUE) % N`."""
    if value is None:
        return None
    if isinstance(value, bool):
        raise ValueError("bucket transform is not defined for booleans")
    if isinstance(value, _dt.datetime):
        raise ValueError("bucket on timestamps is not supported here")
    if isinstance(value, _dt.date):
        value = (value - _EPOCH).days
    if isinstance(value, int):
        h = murmur3_x86_32(
            int(value).to_bytes(8, "little", signed=True), 0
        )
    elif isinstance(value, str):
        h = murmur3_x86_32(value.encode("utf-8"), 0)
    else:
        raise ValueError(f"bucket transform source type {type(value)}")
    return (h & 0x7FFFFFFF) % n


@dataclass(frozen=True)
class PartitionField:
    """One parsed partition-spec field: how to derive the value on
    write, how to transform a predicate literal for pruning, and how
    to type the value for Avro/hive round-trips."""

    source: str  # source column name
    source_id: int  # source field id in the table schema
    source_type: str  # iceberg primitive of the source column
    transform: str  # canonical transform string, e.g. "bucket[8]"
    name: str  # partition field name (iceberg convention)
    field_id: int  # partition field id (1000 + ordinal)
    avro_type: str  # avro primitive of the partition value
    order_preserving: bool


_TRUNC_RE = re.compile(r"^truncate\[(\d+)\]$")
_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")


def parse_spec(
    spec: list[tuple[str, str]],
    schema_fields: list[dict],
    first_field_id: int = 1000,
) -> list[PartitionField]:
    """Validate (source_column, transform) pairs against the table's
    field-id schema; returns PartitionFields with spec-conventional
    names (`col`, `col_bucket`, `col_trunc`, `col_year|month|day`)."""
    by_name = {f["name"]: f for f in schema_fields}
    out: list[PartitionField] = []
    for i, (col, tr) in enumerate(spec):
        if col not in by_name:
            raise ValueError(f"partition source column {col!r} not in schema")
        src = by_name[col]
        src_t = src["type"]
        if tr == "identity":
            if src_t not in ("int", "long", "string"):
                raise ValueError(
                    f"identity partition on type {src_t!r} not supported"
                )
            name, avro_t, order = col, src_t, True
        elif tr in ("year", "month", "day"):
            if src_t not in ("date", "timestamp", "timestamptz"):
                raise ValueError(
                    f"{tr} transform needs a date/timestamp column"
                )
            name, avro_t, order = f"{col}_{tr}", "int", True
        elif tr == "hour":
            if src_t not in ("timestamp", "timestamptz"):
                raise ValueError("hour transform needs a timestamp column")
            name, avro_t, order = f"{col}_hour", "int", True
        elif _TRUNC_RE.match(tr):
            if src_t not in ("int", "long", "string"):
                raise ValueError(
                    f"truncate partition on type {src_t!r} not supported"
                )
            name, avro_t, order = f"{col}_trunc", src_t, True
        elif _BUCKET_RE.match(tr):
            if src_t not in ("int", "long", "string", "date"):
                raise ValueError(
                    f"bucket partition on type {src_t!r} not supported"
                )
            name, avro_t, order = f"{col}_bucket", "int", False
        else:
            raise ValueError(f"unknown partition transform {tr!r}")
        out.append(
            PartitionField(
                source=col,
                source_id=src["id"],
                source_type=src_t,
                transform=tr,
                name=name,
                field_id=first_field_id + i,
                avro_type=avro_t,
                order_preserving=order,
            )
        )
    return out


def partition_expr(pf: PartitionField, src_type: str) -> Column:
    """The Spark Column computing `pf`'s partition value from its
    source column — pure builtin expressions for every transform
    except bucket (spec murmur3 seed-0 has no JVM builtin: F.hash is
    seed-42), which runs as an Arrow-batched pandas UDF."""
    c = F.col(pf.source)
    is_ts = src_type in ("timestamp", "timestamptz")
    if is_ts and pf.transform in ("year", "month", "day", "hour"):
        # timestamps partition on their UTC calendar, via epoch math —
        # F.year/F.month directly on a timestamp render in the SESSION
        # time zone, which would make the partition layout depend on
        # who staged the table
        sec = c.cast("long")
        if pf.transform == "hour":
            return ((sec - F.pmod(sec, F.lit(3600))) / 3600).cast("int")
        days = ((sec - F.pmod(sec, F.lit(86400))) / 86400).cast("int")
        if pf.transform == "day":
            return days
        d = F.date_from_unix_date(days)  # DateType: TZ-free calendar
        if pf.transform == "month":
            return ((F.year(d) - 1970) * 12 + F.month(d) - 1).cast("int")
        return (F.year(d) - F.lit(1970)).cast("int")
    if pf.transform == "identity":
        return c
    if pf.transform == "year":
        return (F.year(c) - F.lit(1970)).cast("int")
    if pf.transform == "month":
        return ((F.year(c) - 1970) * 12 + F.month(c) - 1).cast("int")
    if pf.transform == "day":
        return F.datediff(c, F.lit("1970-01-01")).cast("int")
    m = _TRUNC_RE.match(pf.transform)
    if m:
        w = int(m.group(1))
        if src_type == "string":
            return F.substring(c, 1, w)
        # floor-to-W for ints: pmod is non-negative, so negatives
        # truncate DOWN (spec: truncate(-1, 10) = -10)
        return (c - F.pmod(c, F.lit(w))).cast(
            "bigint" if src_type == "long" else "int"
        )
    m = _BUCKET_RE.match(pf.transform)
    assert m, pf.transform
    n = int(m.group(1))
    import pandas as pd

    # The UDF bodies are SELF-CONTAINED (murmur3 restated inline, no
    # references back into this module): executors in a cluster — and
    # the driver-contract sim, which runs from outside the repo — can't
    # import this package, and cloudpickle serializes module-global
    # helpers by reference. Hints are omitted because the module's
    # `from __future__ import annotations` stringifies them and breaks
    # pandas_udf inference; returnType is passed explicitly.
    is_long = src_type in ("int", "long")
    is_date = src_type == "date"

    def _bucket(s):  # pd.Series -> pd.Series
        import numpy as _np
        import pandas as _pd

        c1, c2 = _np.uint32(0xCC9E2D51), _np.uint32(0x1B873593)

        def mm_long_vec(v):
            # little-endian uint32-pair view; uint64-scalar ops fall
            # off numpy's fast path (see _murmur3_long_vec)
            w = _np.ascontiguousarray(v.astype("<i8")).view(_np.uint32)
            h = _np.zeros(len(v), dtype=_np.uint32)
            for k in (w[0::2].copy(), w[1::2].copy()):
                k = k * c1
                k = (k << _np.uint32(15)) | (k >> _np.uint32(17))
                k = k * c2
                h ^= k
                h = (h << _np.uint32(13)) | (h >> _np.uint32(19))
                h = h * _np.uint32(5) + _np.uint32(0xE6546B64)
            h ^= _np.uint32(8)
            h ^= h >> _np.uint32(16)
            h = h * _np.uint32(0x85EBCA6B)
            h ^= h >> _np.uint32(13)
            h = h * _np.uint32(0xC2B2AE35)
            h ^= h >> _np.uint32(16)
            return h.view(_np.int32)

        if is_long or is_date:
            mask = s.notna()
            out = _pd.Series(
                _np.zeros(len(s), dtype=_np.int64), index=s.index
            )
            if mask.any():
                if is_date:
                    vals = (
                        (
                            _pd.to_datetime(s[mask])
                            - _pd.Timestamp("1970-01-01")
                        )
                        .dt.days.to_numpy(dtype=_np.int64)
                    )
                else:
                    vals = s[mask].to_numpy(dtype=_np.int64)
                h = mm_long_vec(vals).astype(_np.int64)
                out[mask] = (h & 0x7FFFFFFF) % n
            return out.where(mask, None).astype("Int32")

        # string: scalar murmur per UNIQUE value (bucket sources are
        # key-like; the per-batch unique count is bounded in practice)
        def mm_bytes(data):
            h = 0
            ln = len(data)
            for i in range(0, ln & ~3, 4):
                k = int.from_bytes(data[i : i + 4], "little")
                k = (k * 0xCC9E2D51) & 0xFFFFFFFF
                k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
                k = (k * 0x1B873593) & 0xFFFFFFFF
                h ^= k
                h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
                h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
            k = 0
            tail = data[ln & ~3 :]
            if len(tail) >= 3:
                k ^= tail[2] << 16
            if len(tail) >= 2:
                k ^= tail[1] << 8
            if len(tail) >= 1:
                k ^= tail[0]
                k = (k * 0xCC9E2D51) & 0xFFFFFFFF
                k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
                k = (k * 0x1B873593) & 0xFFFFFFFF
                h ^= k
            h ^= ln
            h ^= h >> 16
            h = (h * 0x85EBCA6B) & 0xFFFFFFFF
            h ^= h >> 13
            h = (h * 0xC2B2AE35) & 0xFFFFFFFF
            h ^= h >> 16
            return h

        uniq = {
            v: (mm_bytes(v.encode("utf-8")) & 0x7FFFFFFF) % n
            for v in s.dropna().unique()
        }
        return s.map(uniq).astype("Int32")

    return F.pandas_udf(_bucket, "int")(c)


def transform_literal(pf: PartitionField, lit: Any) -> Any:
    """`lit` mapped into `pf`'s partition domain (what the spec calls
    projecting a predicate): the value a row with source == lit would
    have recorded in its file's partition tuple."""
    if lit is None:
        return None
    if pf.transform == "identity":
        return lit
    if pf.transform in ("year", "month", "day", "hour"):
        if pf.source_type in ("timestamp", "timestamptz"):
            # timestamp partition values are UTC epoch math; a NAIVE
            # datetime literal is interpreted by Spark's residual
            # filter in the SESSION time zone, so only tz-aware
            # literals can prune — anything else raises here and
            # partition_may_match conservatively keeps the file
            if not isinstance(lit, _dt.datetime) or lit.tzinfo is None:
                raise ValueError(
                    "timestamp partition pruning needs a tz-aware "
                    f"datetime literal (got {lit!r})"
                )
            ep = int(lit.timestamp())
            if pf.transform == "hour":
                return ep // 3600
            d = _dt.datetime.fromtimestamp(ep, _dt.timezone.utc).date()
            if pf.transform == "day":
                return (d - _EPOCH).days
            if pf.transform == "month":
                return (d.year - 1970) * 12 + d.month - 1
            return d.year - 1970
        if isinstance(lit, _dt.datetime):
            lit = lit.date()
        if isinstance(lit, str):
            lit = _dt.date.fromisoformat(lit)
        if not isinstance(lit, _dt.date):
            raise ValueError(f"{pf.transform} literal must be a date: {lit!r}")
        if pf.transform == "day":
            return (lit - _EPOCH).days
        if pf.transform == "month":
            return (lit.year - 1970) * 12 + lit.month - 1
        return lit.year - 1970
    m = _TRUNC_RE.match(pf.transform)
    if m:
        w = int(m.group(1))
        if isinstance(lit, str):
            return lit[:w]
        if isinstance(lit, bool) or not isinstance(lit, int):
            raise ValueError(f"truncate literal type {type(lit)}")
        return lit - (lit % w)  # python % floors: matches pmod
    m = _BUCKET_RE.match(pf.transform)
    assert m, pf.transform
    return bucket_of(lit, int(m.group(1)))


def partition_may_match(
    pf: PartitionField, pv: Any, op: str, lit: Any
) -> bool:
    """Can any row of a file whose partition value for `pf` is `pv`
    satisfy `source op lit`? Conservative: True unless provably empty.

    The partition value is CONSTANT across the file, so:
    - null checks are exact for every transform (a null source always
      produces a null partition value);
    - identity evaluates exactly;
    - order-preserving transforms compare the transformed literal with
      INCLUSIVE bounds (rows strictly below `lit` may share its
      transformed value);
    - bucket prunes only equality shapes.
    """
    if op == "isnull":
        return pv is None
    if op == "notnull":
        return pv is not None
    if pv is None:
        return False  # all-null source: no comparison matches
    if pf.transform == "identity":
        from . import skipping

        return skipping._exact_may_match(pv, op, lit)
    if op == "in":
        return any(partition_may_match(pf, pv, "=", v) for v in lit)
    if not pf.order_preserving:  # bucket
        if op == "=":
            try:
                return pv == transform_literal(pf, lit)
            except (ValueError, TypeError):
                return True  # unhashable literal type: keep, let the
                # residual filter decide
        return True  # ranges / != can't prune through a hash
    try:
        tl = transform_literal(pf, lit)
    except (ValueError, TypeError):
        return True  # untransformable literal: conservative keep
    if tl is None:
        return False
    if op == "=":
        return pv == tl
    if op == "!=":
        return True  # other rows in the file may differ from lit
    if op in ("<", "<="):
        return pv <= tl
    if op in (">", ">="):
        return pv >= tl
    return True


def files_may_match(
    part_fields: list[PartitionField],
    partition: dict[str, Any],
    predicates: list[tuple[str, str, Any]],
) -> bool:
    """Partition-domain pruning for one file: every predicate must be
    satisfiable under every spec field derived from its column. Spec
    fields whose partition value is MISSING from the tuple (e.g. a
    file written under an older spec that lacked the field) keep the
    file — unknown means unprunable."""
    by_source: dict[str, list[PartitionField]] = {}
    for pf in part_fields:
        by_source.setdefault(pf.source, []).append(pf)
    for col, op, lit in predicates:
        for pf in by_source.get(col, ()):
            if pf.name not in partition:
                continue
            if not partition_may_match(pf, partition[pf.name], op, lit):
                return False
    return True


def summary_may_match(
    pf: PartitionField,
    lo: Any,
    hi: Any,
    contains_null: bool,
    op: str,
    lit: Any,
) -> bool:
    """Can any file under a MANIFEST whose field_summary for `pf` is
    [lo, hi] (+ contains_null) satisfy `source op lit`? The spec's
    first pruning tier: manifest-list entries summarize each spec
    field across the whole manifest, so a non-matching manifest is
    skipped without even being OPENED — at 100 TB that's the
    difference between O(#manifests) and O(#files) metadata reads.
    Conservative: missing bounds keep the manifest; `!=`, `notnull`
    and bucket ranges never prune."""
    if op == "isnull":
        return bool(contains_null) or (lo is None and hi is None)
    if op == "notnull":
        return True  # summaries don't prove all-null
    if op == "in":
        return any(summary_may_match(pf, lo, hi, contains_null, "=", v) for v in lit)
    if op == "!=":
        return True
    try:
        tl = transform_literal(pf, lit)
    except (ValueError, TypeError):
        return True
    if tl is None:
        return False  # comparisons never match null
    if not pf.order_preserving and op != "=":
        return True  # bucket: ranges can't prune through a hash
    if op == "=":
        if lo is not None and tl < lo:
            return False
        if hi is not None and tl > hi:
            return False
        return True
    # order-preserving ranges with inclusive transformed bounds
    if op in ("<", "<="):
        return lo is None or lo <= tl
    if op in (">", ">="):
        return hi is None or hi >= tl
    return True


def manifest_may_match(
    part_fields: list[PartitionField],
    summaries: list[dict],
    predicates: list[tuple[str, str, Any]],
) -> bool:
    """Evaluate a manifest-list entry's `partitions` field_summary list
    (positional, one per spec field) against the predicates. Shorter
    or missing summary lists keep the manifest."""
    by_pos = {pf.name: i for i, pf in enumerate(part_fields)}
    for col, op, lit in predicates:
        for pf in part_fields:
            if pf.source != col:
                continue
            i = by_pos[pf.name]
            if i >= len(summaries):
                continue
            s = summaries[i] or {}
            if not summary_may_match(
                pf,
                s.get("lower_bound"),
                s.get("upper_bound"),
                bool(s.get("contains_null")),
                op,
                lit,
            ):
                return False
    return True


def fields_from_spec_json(
    fields_json: list[dict], schema_fields: list[dict]
) -> list[PartitionField]:
    """Reconstruct PartitionFields from a metadata `partition-specs`
    entry's `fields` list (spec JSON: name / transform / source-id /
    field-id). Fields whose source column is gone from the schema or
    whose transform this reader doesn't know are DROPPED — the caller
    then simply cannot prune on them, which is the conservative
    direction (vs. create-time parse_spec, which raises)."""
    by_id = {f["id"]: f for f in schema_fields}
    out: list[PartitionField] = []
    for fj in fields_json:
        src = by_id.get(fj.get("source-id"))
        if src is None or not isinstance(src.get("type"), str):
            continue
        tr = fj["transform"]
        src_t = src["type"]
        if tr == "identity" and src_t in ("int", "long", "string"):
            avro_t, order = src_t, True
        elif tr in ("year", "month", "day") and src_t in (
            "date",
            "timestamp",
            "timestamptz",
        ):
            avro_t, order = "int", True
        elif tr == "hour" and src_t in ("timestamp", "timestamptz"):
            avro_t, order = "int", True
        elif _TRUNC_RE.match(tr) and src_t in ("int", "long", "string"):
            avro_t, order = src_t, True
        elif _BUCKET_RE.match(tr) and src_t in (
            "int",
            "long",
            "string",
            "date",
        ):
            avro_t, order = "int", False
        else:
            continue
        out.append(
            PartitionField(
                source=src["name"],
                source_id=src["id"],
                source_type=src_t,
                transform=tr,
                name=fj["name"],
                field_id=fj.get("field-id", 1000),
                avro_type=avro_t,
                order_preserving=order,
            )
        )
    return out


def decode_hive_value(pf: PartitionField, raw: str | None) -> Any:
    """A hive directory value (already URL-unquoted, None for the
    default partition) typed into `pf`'s partition domain."""
    if raw is None:
        return None
    if pf.avro_type in ("int", "long"):
        return int(raw)
    return raw
