"""Cross-engine type-class normalization for the oracle contract.

The driver's canonical value hash is type-sensitive: a DuckDB HUGEINT
(what DuckDB infers for ``sum(<integer CASE>)``) hashes differently from
Spark's LONG even when every value is numerically identical — exactly
the class of bug that made ``q12_late_shipment_priority`` the only red
row in round 3 while every value-level check (stringified-tuple sweeps
at two timezones and two scale factors) stayed green.

This module gives both verification layers (tests/ and
tools/driver_sim.py) one shared normalization: an engine type maps to a
small type-class alphabet, and two result schemas are compatible only
when the sorted per-column classes agree. The registry's determinism
rule (plans/registry.py: "sums of integers are cast to BIGINT on the
DuckDB side") becomes machine-checked instead of a comment.

Class alphabet: int (signed <=64-bit), hugeint (128-bit / unsigned
64-bit — never legal in an oracle result), decimal, float, str, bool,
date, ts, bytes, array, struct, map.
"""

from __future__ import annotations

import re

# DuckDB declared result types, via str(rel.types[i]) on a LIMIT-0
# relation. Parametrized types (DECIMAL(38,2), VARCHAR(10)) keep their
# base name; list types look like 'BIGINT[]'.
_DUCK_CLASSES = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "hugeint",  # exceeds int64 range: unsafe like HUGEINT
    "HUGEINT": "hugeint",
    "UHUGEINT": "hugeint",
    "DECIMAL": "decimal",
    "FLOAT": "float",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts",
    "TIMESTAMP_S": "ts",
    "TIMESTAMP_MS": "ts",
    "TIMESTAMP_NS": "ts",
    "BLOB": "bytes",
    "STRUCT": "struct",
    "MAP": "map",
}

# Type classes that must never appear in an oracle result: the driver's
# hash diverges from Spark's LONG/DOUBLE output even when values match.
BANNED_ORACLE_CLASSES = frozenset({"hugeint", "decimal"})


def duck_type_class(type_str: str) -> str:
    """Normalize a DuckDB declared type string to a type class."""
    s = str(type_str).strip()
    if s.endswith("[]"):
        return "array"
    base = re.sub(r"\(.*\)$", "", s).strip()
    if base.startswith("STRUCT"):
        return "struct"
    if base.startswith("MAP"):
        return "map"
    return _DUCK_CLASSES.get(base, base.lower())


def spark_type_class(dt) -> str:
    """Normalize a pyspark.sql.types.DataType to a type class."""
    name = type(dt).__name__
    table = {
        "ByteType": "int",
        "ShortType": "int",
        "IntegerType": "int",
        "LongType": "int",
        "FloatType": "float",
        "DoubleType": "float",
        "DecimalType": "decimal",
        "StringType": "str",
        "BooleanType": "bool",
        "DateType": "date",
        "TimestampType": "ts",
        "TimestampNTZType": "ts",
        "BinaryType": "bytes",
        "ArrayType": "array",
        "StructType": "struct",
        "MapType": "map",
    }
    return table.get(name, name.lower())


def schema_signature_duck(columns, types) -> dict[str, str]:
    return {c: duck_type_class(t) for c, t in zip(columns, types)}


def schema_signature_spark(schema) -> dict[str, str]:
    return {f.name: spark_type_class(f.dataType) for f in schema.fields}


def signature_mismatches(
    spark_sig: dict[str, str], duck_sig: dict[str, str]
) -> list[str]:
    """Human-readable per-column type-class disagreements (shared
    columns only — column-set mismatches are reported separately)."""
    out = []
    for col in sorted(set(spark_sig) & set(duck_sig)):
        if spark_sig[col] != duck_sig[col]:
            out.append(f"{col}: spark={spark_sig[col]} duck={duck_sig[col]}")
    return out
