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

`readChangeFeed=true` (round 5) streams the table's CHANGE DATA FEED
instead of its rows: the schema gains `_change_type` /
`_commit_version`, and each micro-batch renders its commits' row-level
changes — `cdc` actions read as written (the complete description per
the protocol's reader contract), append commits as inserts,
remove-only commits as deletes from the removed files' content,
rewrites without cdc refuse. Mirrors
deltalog.DeltaLogReader.changes, micro-batched (the stream-batch
parity is pinned by tests and the registered query).

Scope gates (loud, tested): reader protocol 1 and 2 stream, and 3
streams when readerFeatures need nothing beyond columnMapping and
deletionVectors — COLUMN-MAPPED tables work (round 8: the workers
scan physical column names and partitionValues resolve by physical
key; nested columns under mapping refuse, their member renames need
the batch reader), and the CDF stream renders DELETION-VECTOR
commits (round 8): a DV transition's newly-tombstoned rows emit as
deletes (the bitmap DIFF decodes DRIVER-side in partitions() — the
worker just receives the position list, staying stdlib-only), files
born WITH a vector insert only their live complement, and a
whole-file remove of a vectored file deletes only its live rows —
the exact batch changes() semantics, micro-batched. DV adds still
refuse on the PLAIN streaming path (an append stream cannot render
row-level deletes). The log must still contain JSON commit 0 onward
for the replayed range (vacuumed tails refuse), and partition column
types are limited to the string-serializable set the worker can
reconstruct.

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

# stdlib-only module, shipped BY VALUE alongside this one (see
# register_delta_stream) — the stream reader's partitions() runs in a
# driver-side Python worker whose sys.path may not have this package,
# and the DV bitmap decode happens there
from ..functions import roaring

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


#: lockstep with deltalog.DeltaLogReader._SUPPORTED_WIDENINGS (this
#: module cannot import deltalog — it ships by value into planner
#: workers where relative imports don't resolve)
_SUPPORTED_WIDENINGS = frozenset(
    {
        ("byte", "short"), ("byte", "integer"), ("byte", "long"),
        ("short", "integer"), ("short", "long"),
        ("integer", "long"),
        ("float", "double"),
        ("byte", "double"), ("short", "double"),
        ("integer", "double"),
    }
)


def _table_meta(log_dir: str) -> dict:
    """Latest metaData action (schemaString, partitionColumns) with the
    protocol gate applied — walked once at query resolution. Reader
    versions 1/2 stream; version 3 streams when readerFeatures need
    nothing beyond columnMapping (deletion vectors refuse at the add
    level)."""
    meta = None
    for v in _versions(log_dir):
        for a in _commit_actions(log_dir, v):
            if "protocol" in a:
                p = a["protocol"]
                mrv = p.get("minReaderVersion", 1)
                feats = set(p.get("readerFeatures") or [])
                # typeWidening streams for free (round 9): values pass
                # through Python objects, where int/long and
                # float/double are indistinguishable — the declared
                # WIDE schema is satisfied without any upcast step
                if mrv > 3 or (
                    mrv == 3
                    and feats
                    - {
                        "columnMapping",
                        "deletionVectors",
                        "typeWidening",
                        "typeWidening-preview",
                    }
                ):
                    raise ValueError(
                        "delta_stream reads protocol reader versions "
                        "1/2 (+3 with columnMapping/deletionVectors/"
                        f"typeWidening); this table needs v{mrv} "
                        f"{sorted(feats)} — use DeltaLogReader for "
                        "snapshots"
                    )
            if "metaData" in a and a["metaData"].get("schemaString"):
                meta = a["metaData"]
    if meta is None:
        raise ValueError(f"no metaData action found in {log_dir}")
    # the batch reader's recorded-conversion validation applies here
    # too (code review r9): a widening it refuses must refuse loudly
    # BEFORE the stream starts, not fail mid-batch. Inlined (NOT
    # imported from deltalog): _table_meta runs inside the PLANNER's
    # by-value Python worker, where relative imports don't resolve —
    # keep _SUPPORTED_WIDENINGS in lockstep with deltalog's.
    for f in json.loads(meta["schemaString"])["fields"]:
        for ch in (f.get("metadata") or {}).get("delta.typeWidening") or []:
            frm, to = str(ch.get("fromType")), str(ch.get("toType"))
            ok = (frm, to) in _SUPPORTED_WIDENINGS or (
                frm.startswith("decimal") and to.startswith("decimal")
            )
            if not ok:
                raise ValueError(
                    f"delta_stream: typeWidening records {frm} -> {to} "
                    f"on column {f['name']!r}, which this reader cannot "
                    "upcast"
                )
    return meta


def _phys_by_logical(meta: dict) -> dict[str, str]:
    """logical -> PHYSICAL column name (identity without mapping)."""
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    fields = json.loads(meta["schemaString"])["fields"]
    if mode == "none":
        return {f["name"]: f["name"] for f in fields}
    return {
        f["name"]: (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"]
        )
        for f in fields
    }


def _nested_spec(t):
    """Recursive physical-member spec for a column-mapped NESTED
    column (round 9 — the r8 refusal closed): the worker reads the
    physical struct via pyarrow (dicts keyed by FILE member names)
    and rebuilds logical rows as tuples in LOGICAL member order.
    ('struct', [(phys_member_name, sub_spec), ...]) /
    ('list', sub) / ('map', key_sub, val_sub) / ('prim',) —
    plain data, so the by-value stdlib-only worker carries it."""
    if isinstance(t, dict) and t.get("type") == "struct":
        return (
            "struct",
            [
                (
                    (f.get("metadata") or {}).get(
                        "delta.columnMapping.physicalName", f["name"]
                    ),
                    _nested_spec(f["type"]),
                )
                for f in t["fields"]
            ],
        )
    if isinstance(t, dict) and t.get("type") == "array":
        return ("list", _nested_spec(t["elementType"]))
    if isinstance(t, dict) and t.get("type") == "map":
        return ("map", _nested_spec(t["keyType"]), _nested_spec(t["valueType"]))
    return ("prim",)


def _apply_spec(value, spec):
    """Convert one pyarrow-pylist value through a _nested_spec."""
    if value is None or spec[0] == "prim":
        return value
    if spec[0] == "struct":
        return tuple(
            _apply_spec(value.get(pm), sub) for pm, sub in spec[1]
        )
    if spec[0] == "list":
        return [_apply_spec(x, spec[1]) for x in value]
    pairs = value.items() if isinstance(value, dict) else value
    return {
        _apply_spec(k, spec[1]): _apply_spec(v, spec[2])
        for k, v in pairs
    }


class _DeltaFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        columns: list[tuple[str, str, str]],  # (name, type, physical)
        partition_values: dict[str, str | None],  # PHYSICAL keys
        change_type: str | None = None,  # CDF: constant tag, or
        commit_version: int | None = None,  # None = read from the file
        include_positions: list[int] | None = None,  # DV diff deletes
        exclude_positions: list[int] | None = None,  # live complement
    ):
        self.path = path
        self.columns = columns
        self.partition_values = partition_values
        self.change_type = change_type
        self.commit_version = commit_version
        self.include_positions = include_positions
        self.exclude_positions = exclude_positions


def _adds_until(log_dir: str, v_excl: int) -> dict[str, dict]:
    """path -> latest add action over commits [0, v_excl) — the live
    metadata a remove-only commit's CDF rendering needs (remove
    actions may omit partitionValues)."""
    adds: dict[str, dict] = {}
    for v in _versions(log_dir):
        if v >= v_excl:
            break
        for a in _commit_actions(log_dir, v):
            if "add" in a:
                adds[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                adds.pop(a["remove"]["path"], None)
    return adds


def _decode_dv(table_path: str, add: dict) -> list[int]:
    """Decode one add action's deletion vector into its position list
    (uuid / relative-path / inline storage per PROTOCOL.md). Called
    from partitions(), which runs in the DRIVER-SIDE Python worker —
    roaring ships by value next to this module so the decode needs no
    package import there."""
    dv = add["deletionVector"]
    st = dv.get("storageType")
    size = int(dv.get("sizeInBytes") or 0)
    if st == "i":
        return roaring.positions_from_descriptor(
            "i", dv["pathOrInlineDv"], "", 0, size
        )
    offset = int(dv.get("offset") or 1)
    if st == "p":
        p = unquote(dv["pathOrInlineDv"])
        bin_path = (
            p if p.startswith("/") else os.path.join(table_path, p)
        )
        return roaring.positions_from_descriptor(
            "p", "", bin_path, offset, size
        )
    if st == "u":
        import uuid as _uuid

        s = dv["pathOrInlineDv"]
        if len(s) < 20:
            raise ValueError(f"malformed uuid deletion vector path {s!r}")
        prefix, z = s[:-20], s[-20:]
        u = _uuid.UUID(bytes=roaring.z85_decode(z))
        base = (
            os.path.join(table_path, prefix) if prefix else table_path
        )
        return roaring.positions_from_descriptor(
            "u",
            "",
            os.path.join(base, f"deletion_vector_{u}.bin"),
            offset,
            size,
        )
    raise ValueError(f"deletionVector storageType {st!r}")


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
        self.read_change_feed = (
            str(options.get("readChangeFeed", "false")).lower() == "true"
        )
        sv = options.get("startingVersion")
        self._starting_version = None if sv is None else int(sv)
        meta = _table_meta(self.log_dir)
        fields = json.loads(meta["schemaString"])["fields"]
        from pyspark.sql.types import StructType

        struct = StructType.fromJson(
            {"type": "struct", "fields": fields}
        )
        phys = _phys_by_logical(meta)
        mode = (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        )
        self._columns = [
            (
                f["name"],
                struct[f["name"]].dataType.simpleString(),
                phys[f["name"]],
                # nested mapped columns rebuild member-by-member in
                # the worker; unmapped tables pass values through
                (
                    _nested_spec(f["type"])
                    if mode != "none" and isinstance(f.get("type"), dict)
                    else None
                ),
            )
            for f in fields
        ]
        # partitionColumns store PHYSICAL names under mapping
        by_phys = {p: n for n, p in phys.items()}
        self._part_cols = [
            by_phys.get(c, c)
            for c in (meta.get("partitionColumns") or [])
        ]
        types = {c[0]: c[1] for c in self._columns}
        for c in self._part_cols:
            if types.get(c) not in _PARTITION_TYPES:
                raise ValueError(
                    f"partition column {c!r} has type {types.get(c)!r}; "
                    f"delta_stream reconstructs {sorted(_PARTITION_TYPES)}"
                )

    def initialOffset(self):
        if self._starting_version is not None:
            return {"version": self._starting_version - 1}
        return {"version": _versions(self.log_dir)[-1]}

    def latestOffset(self):
        return {"version": _versions(self.log_dir)[-1]}

    def _cdf_partitions(self, v0: int, v1: int) -> list:
        """readChangeFeed=true: per commit, cdc actions are the
        COMPLETE change description when present (reader contract,
        PROTOCOL.md "Change Data Files"); otherwise dataChange adds
        render as inserts and remove-only commits render their
        removed files as deletes (files are immutable until vacuum);
        rewrites without cdc refuse. Mirrors
        deltalog.DeltaLogReader.changes, micro-batched."""
        out: list[_DeltaFilePartition] = []
        cdc_cols = self._columns + [
            ("_change_type", "string", "_change_type", None)
        ]
        # live-set tracker, one forward pass (delete rendering needs
        # each removed path's original add for its partitionValues)
        live = _adds_until(self.log_dir, v0 + 1)
        for v in range(v0 + 1, v1 + 1):
            actions = _commit_actions(self.log_dir, v)
            cdcs = [a["cdc"] for a in actions if "cdc" in a]
            adds = [
                a["add"]
                for a in actions
                if "add" in a and a["add"].get("dataChange", True)
            ]
            removes = [
                a["remove"]
                for a in actions
                if "remove" in a and a["remove"].get("dataChange", True)
            ]

            def full(rel: str) -> str:
                rel = unquote(rel)
                return (
                    rel
                    if rel.startswith("/")
                    else os.path.join(self.path, rel)
                )

            if cdcs:
                for c in cdcs:
                    out.append(
                        _DeltaFilePartition(
                            full(c["path"]),
                            cdc_cols,
                            c.get("partitionValues") or {},
                            change_type=None,  # in the file
                            commit_version=v,
                        )
                    )
                for a in actions:  # advance: removes before adds
                    if "remove" in a:
                        live.pop(a["remove"]["path"], None)
                for a in actions:
                    if "add" in a:
                        live[a["add"]["path"]] = a["add"]
                continue
            # split DV transitions / born-with-DV adds from plain
            # adds — the exact batch changes() classification
            dv_transitions: list[tuple[dict, dict]] = []
            born_with_dv: list[dict] = []
            plain_adds: list[dict] = []
            for add in adds:
                prev = live.get(add["path"])
                if add.get("deletionVector"):
                    if prev is None:
                        born_with_dv.append(add)
                    else:
                        dv_transitions.append((add, prev))
                else:
                    plain_adds.append(add)
            trans_paths = {a["path"] for a, _prev in dv_transitions}
            plain_removes = [
                r for r in removes if r["path"] not in trans_paths
            ]
            if (plain_adds or born_with_dv) and plain_removes:
                raise ValueError(
                    f"commit {v} rewrites data files without cdc "
                    "actions — stage the table with CDF enabled"
                )
            for add in plain_adds:
                out.append(
                    _DeltaFilePartition(
                        full(add["path"]),
                        self._columns,
                        add.get("partitionValues") or {},
                        change_type="insert",
                        commit_version=v,
                    )
                )
            for add in born_with_dv:
                # birth-tombstoned rows were never visible: insert the
                # live complement only
                out.append(
                    _DeltaFilePartition(
                        full(add["path"]),
                        self._columns,
                        add.get("partitionValues") or {},
                        change_type="insert",
                        commit_version=v,
                        exclude_positions=_decode_dv(self.path, add),
                    )
                )
            for add, prev in dv_transitions:
                # newly-tombstoned rows = new bitmap minus previous
                newp = set(_decode_dv(self.path, add))
                oldp = (
                    set(_decode_dv(self.path, prev))
                    if prev.get("deletionVector")
                    else set()
                )
                diff = sorted(newp - oldp)
                if not diff:
                    continue
                out.append(
                    _DeltaFilePartition(
                        full(add["path"]),
                        self._columns,
                        add.get("partitionValues") or {},
                        change_type="delete",
                        commit_version=v,
                        include_positions=diff,
                    )
                )
            for r in plain_removes:
                a = live.get(r["path"]) or r
                # a removed file that carried a vector deletes only
                # its LIVE rows (tombstones already emitted)
                exclude = (
                    _decode_dv(self.path, a)
                    if a.get("deletionVector")
                    else None
                )
                out.append(
                    _DeltaFilePartition(
                        full(r["path"]),
                        self._columns,
                        a.get("partitionValues") or {},
                        change_type="delete",
                        commit_version=v,
                        exclude_positions=exclude,
                    )
                )
            # advance the tracker: removes BEFORE adds (add supersedes
            # a same-commit remove regardless of serialization order)
            for a in actions:
                if "remove" in a:
                    live.pop(a["remove"]["path"], None)
            for a in actions:
                if "add" in a:
                    live[a["add"]["path"]] = a["add"]
        return out

    def partitions(self, start, end):
        v0, v1 = int(start["version"]), int(end["version"])
        if self.read_change_feed:
            return self._cdf_partitions(v0, v1)
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
        for _name, t, phys, spec in partition.columns:
            if phys in names:
                vals = table.column(phys).to_pylist()
                if spec is not None:
                    vals = [_apply_spec(v, spec) for v in vals]
                cols.append(vals)
            elif phys in partition.partition_values:
                cols.append(
                    [conv(partition.partition_values[phys], t)] * n
                )
            else:
                cols.append([None] * n)
        inc = (
            set(partition.include_positions)
            if partition.include_positions is not None
            else None
        )
        exc = (
            set(partition.exclude_positions)
            if partition.exclude_positions is not None
            else None
        )

        def rows():
            for i, row in enumerate(zip(*cols)):
                if inc is not None and i not in inc:
                    continue
                if exc is not None and i in exc:
                    continue
                yield row

        if partition.commit_version is None:
            yield from rows()
        elif partition.change_type is None:
            # CDF cdc file: _change_type is the last column already
            for row in rows():
                yield row + (partition.commit_version,)
        else:
            for row in rows():
                yield row + (
                    partition.change_type,
                    partition.commit_version,
                )

    def commit(self, end):
        pass  # offsets are durable table versions; nothing to ack


def register_delta_stream(spark) -> None:
    """Register the source as `delta_stream`, shipping this module —
    AND functions/roaring, its one non-stdlib dependency (the DV
    bitmap decode) — BY VALUE so the Python workers of an external
    driver, whose cwd may not have this package importable, can
    unpickle the reader (same policy as operators/multimodal)."""
    import sys

    from pyspark import cloudpickle

    try:
        cloudpickle.register_pickle_by_value(roaring)
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
        from pyspark.sql.types import (
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        s = StructType.fromJson(json.loads(meta["schemaString"]))
        if str(self.options.get("readChangeFeed", "false")).lower() == "true":
            s = StructType(
                s.fields
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", IntegerType()),
                ]
            )
        return s

    def streamReader(self, schema) -> DeltaStreamReader:
        return DeltaStreamReader(self.options)
