"""Streaming source over an EXTERNALLY-WRITTEN Delta table — the
interop twin of sources/acidstream.py (which streams the engine's own
AcidTable), built on Spark 4's Python DataSource stream API.

Offsets are DELTA VERSIONS: micro-batch (start, end] emits exactly the
data files the in-range JSON commits ADDED with dataChange=true, one
input partition per file, each read in the Python worker via pyarrow
with the commit's partitionValues attached as typed constants (Delta
data files do not contain partition columns). This is precisely the
published Delta streaming-source model for append-only tables: new
commits become new batches, file-granular and deterministic, so
replaying any offset range yields identical rows and checkpoint
recovery is exactly-once by construction.

Non-append commits follow Delta's documented option semantics:
- default: a remove with dataChange=true REFUSES (streaming an updated
  table would mis-render row-level changes);
- `ignoreDeletes=true`: delete-only commits (e.g. dropping a
  partition) are skipped — their removes emit nothing;
- `ignoreChanges=true`: rewrite commits are allowed and their ADDED
  files are emitted — which can re-emit rows that were already
  streamed (Delta's own documented caveat at file granularity).
OPTIMIZE-shaped dataChange=false adds/removes are always invisible.

Scope gates (loud, tested): reader protocol must be version 1 (no
column mapping / deletion vectors on the streaming path), the log must
still contain JSON commit 0 onward for the replayed range (vacuumed
tails refuse), and partition column types are limited to the
string-serializable set the worker can reconstruct.

Usage:
    spark.dataSource.register(DeltaStreamDataSource)
    (spark.readStream.format("delta_stream")
         .option("path", "/path/to/table")
         .option("startingVersion", "0")   # replay from version 0
         .load())
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# partition-column Spark simpleStrings the worker can reconstruct from
# the log's string serialization
_PARTITION_TYPES = {
    "tinyint", "smallint", "int", "bigint",
    "float", "double", "boolean", "date", "string",
}


def _log_dir(path: str) -> str:
    d = os.path.join(path.rstrip("/"), "_delta_log")
    if not os.path.isdir(d):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {path}")
    return d


def _versions(log_dir: str) -> list[int]:
    return sorted(
        int(os.path.splitext(f)[0])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and os.path.splitext(f)[0].isdigit()
    )


def _commit_actions(log_dir: str, v: int) -> list[dict]:
    p = os.path.join(log_dir, f"{v:020d}.json")
    if not os.path.exists(p):
        raise FileNotFoundError(f"missing commit {v} (vacuumed?): {p}")
    with open(p) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def _table_meta(log_dir: str) -> dict:
    """Latest metaData action (schemaString, partitionColumns) with the
    protocol gate applied — walked once at query resolution."""
    meta = None
    for v in _versions(log_dir):
        for a in _commit_actions(log_dir, v):
            if "protocol" in a and a["protocol"].get("minReaderVersion", 1) > 1:
                raise ValueError(
                    "delta_stream reads protocol reader version 1 only "
                    "(no column mapping / deletion vectors on the "
                    "streaming path); use DeltaLogReader for snapshots"
                )
            if "metaData" in a and a["metaData"].get("schemaString"):
                meta = a["metaData"]
    if meta is None:
        raise ValueError(f"no metaData action found in {log_dir}")
    return meta


class _DeltaFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        columns: list[tuple[str, str]],  # (name, simpleString type)
        partition_values: dict[str, str | None],
    ):
        self.path = path
        self.columns = columns
        self.partition_values = partition_values


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("delta_stream requires .option('path', ...)")
        self.log_dir = _log_dir(self.path)
        self.ignore_deletes = (
            str(options.get("ignoreDeletes", "false")).lower() == "true"
        )
        self.ignore_changes = (
            str(options.get("ignoreChanges", "false")).lower() == "true"
        )
        sv = options.get("startingVersion")
        self._starting_version = None if sv is None else int(sv)
        meta = _table_meta(self.log_dir)
        fields = json.loads(meta["schemaString"])["fields"]
        from pyspark.sql.types import StructField, StructType

        struct = StructType.fromJson(
            {"type": "struct", "fields": fields}
        )
        self._columns = [
            (f.name, f.dataType.simpleString()) for f in struct.fields
        ]
        self._part_cols = list(meta.get("partitionColumns") or [])
        types = dict(self._columns)
        for c in self._part_cols:
            if types.get(c) not in _PARTITION_TYPES:
                raise ValueError(
                    f"partition column {c!r} has type {types.get(c)!r}; "
                    f"delta_stream reconstructs {sorted(_PARTITION_TYPES)}"
                )
        # silence unused warning; StructField import keeps parity with
        # fromJson's field handling
        del StructField

    def initialOffset(self):
        if self._starting_version is not None:
            return {"version": self._starting_version - 1}
        return {"version": _versions(self.log_dir)[-1]}

    def latestOffset(self):
        return {"version": _versions(self.log_dir)[-1]}

    def partitions(self, start, end):
        v0, v1 = int(start["version"]), int(end["version"])
        out: list[_DeltaFilePartition] = []
        for v in range(v0 + 1, v1 + 1):
            actions = _commit_actions(self.log_dir, v)
            removes = [
                a["remove"]
                for a in actions
                if "remove" in a and a["remove"].get("dataChange", True)
            ]
            adds = [
                a["add"]
                for a in actions
                if "add" in a and a["add"].get("dataChange", True)
            ]
            if removes and not (self.ignore_deletes or self.ignore_changes):
                raise ValueError(
                    f"commit {v} removes data; set ignoreDeletes=true "
                    "(delete-only commits) or ignoreChanges=true "
                    "(rewrites; re-emits rewritten rows) — Delta's "
                    "documented streaming semantics"
                )
            if removes and not adds:
                continue  # delete-only commit under ignoreDeletes
            if removes and not self.ignore_changes:
                raise ValueError(
                    f"commit {v} rewrites files (removes+adds); set "
                    "ignoreChanges=true to stream its added files"
                )
            for add in adds:
                if add.get("deletionVector"):
                    raise ValueError(
                        "delta_stream cannot render deletion-vector adds"
                    )
                rel = unquote(add["path"])
                full = (
                    rel
                    if rel.startswith("/")
                    else os.path.join(self.path, rel)
                )
                out.append(
                    _DeltaFilePartition(
                        full,
                        self._columns,
                        add.get("partitionValues") or {},
                    )
                )
        return out

    def read(self, partition: _DeltaFilePartition):
        # executor side: pyarrow scan of one immutable data file;
        # partition columns reconstruct from the log's string values,
        # absent columns project as None
        import datetime

        import pyarrow.parquet as pq

        def conv(raw, t):
            if raw is None:
                return None
            if t in ("tinyint", "smallint", "int", "bigint"):
                return int(raw)
            if t in ("float", "double"):
                return float(raw)
            if t == "boolean":
                return raw == "true"
            if t == "date":
                return datetime.date.fromisoformat(raw)
            return raw

        table = pq.read_table(partition.path)
        names = set(table.column_names)
        n = table.num_rows
        cols = []
        for name, t in partition.columns:
            if name in names:
                cols.append(table.column(name).to_pylist())
            elif name in partition.partition_values:
                cols.append([conv(partition.partition_values[name], t)] * n)
            else:
                cols.append([None] * n)
        yield from zip(*cols)

    def commit(self, end):
        pass  # offsets are durable table versions; nothing to ack


def register_delta_stream(spark) -> None:
    """Register the source as `delta_stream`, shipping this module BY
    VALUE (it is stdlib+pyspark only) so the Python workers of an
    external driver — whose cwd may not have this package importable —
    can unpickle the reader (same policy as operators/multimodal)."""
    import sys

    from pyspark import cloudpickle

    try:
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover — same-cwd runs work anyway
        pass
    spark.dataSource.register(DeltaStreamDataSource)


class DeltaStreamDataSource(DataSource):
    """spark.readStream.format("delta_stream") — register with
    spark.dataSource.register(DeltaStreamDataSource)."""

    @classmethod
    def name(cls) -> str:
        return "delta_stream"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("delta_stream requires .option('path', ...)")
        meta = _table_meta(_log_dir(path))
        from pyspark.sql.types import StructType

        return StructType.fromJson(json.loads(meta["schemaString"]))

    def streamReader(self, schema) -> DeltaStreamReader:
        return DeltaStreamReader(self.options)
