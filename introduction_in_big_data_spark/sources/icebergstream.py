"""Streaming source over an EXTERNALLY-WRITTEN Iceberg table — the
Iceberg twin of sources/deltastream.py, completing the lakehouse
streaming matrix (LAKEHOUSE.md), built on Spark 4's Python DataSource
stream API.

Offsets are durable SNAPSHOT IDS ({"sid": N}; sid 0 = before any
snapshot) — positions in the snapshot list would be silently
re-numbered by expire_snapshots, breaking checkpoint recovery, so the
checkpointed thing is the id and the position is resolved per batch
(a checkpointed id that has since been EXPIRED refuses loudly rather
than mis-aligning). Micro-batch (start, end] emits
exactly the data files the in-range snapshots ADDED, computed as a
manifest-walk set diff against the previous snapshot — the same math
as IcebergTableReader.incremental, micro-batched. One input partition
per file; Iceberg data files carry ALL columns (unlike Delta's
hive-partitioned layout), so the worker read is a plain pyarrow scan
with no partition-value reconstruction.

Append-only contract, enforced loudly per snapshot: a snapshot that
adds delete files (position or equality) or removes data files
REFUSES — streaming row-level changes from a merge-on-read table
would mis-render them (Delta's own streaming-source stance, applied
to Iceberg's artifacts). Compaction REPLACE snapshots also refuse on
this path: their rewrites re-emit rows by construction.

Worker-side code is stdlib+pyarrow only; the Avro manifest walks
(which need functions/avrocodec) run DRIVER-side in
initialOffset/latestOffset/partitions via lazy imports, so shipping
this module by value never drags the codec into the workers.

Usage:
    register_iceberg_stream(spark)
    (spark.readStream.format("iceberg_stream")
         .option("path", "/path/to/table")
         .option("startingSnapshotIndex", "0")  # replay history
         .load())
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


def _pkg():
    """Import the package's iceberg reader from ANY process: Spark
    runs DataSource.schema()/streamReader() in a separate Python
    planner process whose sys.path may not include the repo. This
    module travels by value (register_iceberg_stream), so its
    __file__ points at the repo on the shared filesystem — derive the
    root from it and import by absolute name. (The worker-side read()
    path never needs this: it is stdlib + pyarrow.)"""
    import importlib
    import sys

    try:
        return importlib.import_module(
            "introduction_in_big_data_spark.sources.iceberg"
        )
    except ModuleNotFoundError:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        if root not in sys.path:
            sys.path.insert(0, root)
        return importlib.import_module(
            "introduction_in_big_data_spark.sources.iceberg"
        )


def _meta(path: str) -> dict:
    meta_dir = os.path.join(path, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    with open(hint) as fh:
        v = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as fh:
        return json.load(fh)


def _spark_schema(path: str):
    """Driver-side: the table's Spark schema via the package reader
    (importable on the driver; never called in workers)."""
    return _pkg().IcebergTableReader._schema_struct(_meta(path))


class _IcebergFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        columns: list[str],
        avro_srcs: list | None = None,
        avro_convs: list | None = None,
        orc_srcs: list | None = None,
    ):
        self.path = path
        self.columns = columns
        # AVRO data file (round 11): per-column source field names
        # (field-id-projected DRIVER-side from the writer schema, like
        # the batch scan) and date/timestamp conversion kinds; None →
        # plain parquet partition
        self.avro_srcs = avro_srcs
        self.avro_convs = avro_convs
        # ORC data file (round 12): per-column source names resolved
        # driver-side from the file's `iceberg.id` attributes /
        # name mapping, read worker-side via pyarrow.orc
        self.orc_srcs = orc_srcs


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("iceberg_stream requires .option('path', ...)")
        meta = _meta(self.path)
        self._columns = [f.name for f in _spark_schema(self.path).fields]
        # AVRO data files (round 11): the stdlib container decoder is
        # captured BY VALUE at construction (driver-side), so worker
        # read() of an Avro partition needs no importable package —
        # the avro_io/multimodal codec pattern
        from .avro_io import _avrocodec_by_value

        self._read_container = _avrocodec_by_value().read_container
        si = options.get("startingSnapshotIndex")
        snaps = meta.get("snapshots", [])
        # offset = the snapshot-ID consumed up to (0 = nothing yet);
        # durable across expire_snapshots, unlike a list position
        if si is None:
            sid = snaps[-1]["snapshot-id"] if snaps else 0
        else:
            i = int(si)
            sid = snaps[i - 1]["snapshot-id"] if i > 0 else 0
        self._initial = {"sid": sid}

    def initialOffset(self):
        return self._initial

    def latestOffset(self):
        snaps = _meta(self.path).get("snapshots", [])
        return {"sid": snaps[-1]["snapshot-id"] if snaps else 0}

    @staticmethod
    def _pos_after(snaps, sid: int) -> int:
        """Number of snapshots consumed when `sid` was the last one.
        A checkpointed id missing from the metadata was expired —
        refuse rather than silently mis-align the replay."""
        if sid == 0:
            return 0
        for i, s in enumerate(snaps):
            if s["snapshot-id"] == sid:
                return i + 1
        raise ValueError(
            f"iceberg_stream: checkpointed snapshot {sid} is no longer "
            "in the metadata (expire_snapshots passed the stream's "
            "position); restart the stream from a fresh offset"
        )

    def _files_of(self, snapshot) -> tuple[set, list, list]:
        """Driver-side manifest walk (lazy package import)."""

        class _Shim:
            path = self.path
            spark = None

        data, pos, eq = _pkg().IcebergTableReader._live_files(
            _Shim(), snapshot
        )
        return ({p for p, _ in data}, pos, eq)

    def partitions(self, start, end):
        meta = _meta(self.path)
        snaps = meta.get("snapshots", [])
        i0 = self._pos_after(snaps, int(start["sid"]))
        i1 = self._pos_after(snaps, int(end["sid"]))
        if i0 >= i1:
            return []  # idle trigger: no manifest walk at all
        out: list[_IcebergFilePartition] = []
        prev_data, prev_pos, prev_eq = (
            self._files_of(snaps[i0 - 1]) if i0 > 0 else (set(), [], [])
        )
        for i in range(i0, i1):
            data, pos, eq = self._files_of(snaps[i])
            # SET difference, not counts: an external engine may
            # compact delete files (count shrinks) while adding a new
            # one — any NEW delete file means rows this source cannot
            # render correctly
            if set(pos) - set(prev_pos) or set(eq) - set(prev_eq):
                raise ValueError(
                    f"iceberg_stream: snapshot index {i} adds row-level "
                    "delete files; only append-only tables stream"
                )
            removed = prev_data - data
            if removed:
                raise ValueError(
                    f"iceberg_stream: snapshot index {i} removes "
                    f"{len(removed)} data file(s) (overwrite/REPLACE); "
                    "only append-only tables stream"
                )
            for p in sorted(data - prev_data):
                out.append(self._partition_for(p, meta))
            prev_data, prev_pos, prev_eq = data, pos, eq
        return out

    def _partition_for(
        self, p: str, meta: dict | None = None
    ) -> _IcebergFilePartition:
        """Driver-side partition planning: Avro data files get their
        per-column source names resolved HERE (field-id projection
        from the writer schema — renames resolve; name-mapping, then
        current-name fallback for property-less files, mirroring the
        batch scan) plus date/timestamp conversion kinds, so the
        worker read stays import-free."""
        ice = _pkg()
        if ice._is_orc_data_file(p):
            return self._orc_partition_for(p, meta, ice)
        if not ice._is_avro_data_file(p):
            return _IcebergFilePartition(p, self._columns)
        from .avro_io import read_avro_schema

        if meta is None:
            meta = _meta(self.path)
        fields = ice.IcebergTableReader._schema_fields(meta)
        fd = {f["name"]: f for f in fields}
        mapping = None
        nm = (meta.get("properties") or {}).get(
            "schema.name-mapping.default"
        )
        wsch = read_avro_schema(p)
        by_id: dict[int, str] = {}
        names: set = set()
        any_ids = False
        for af in wsch.get("fields", ()):
            names.add(af["name"])
            if af.get("field-id") is not None:
                any_ids = True
                by_id[int(af["field-id"])] = af["name"]
        if nm and not any_ids:
            mapping = {
                int(e["field-id"]): e.get("names", ())
                for e in json.loads(nm)
                if "field-id" in e
            }
        srcs, convs = [], []
        for c in self._columns:
            f = fd.get(c)
            if f is None:
                src = None
            elif any_ids:
                src = by_id.get(int(f["id"]))
            elif mapping is not None:
                src = next(
                    (n for n in mapping.get(int(f["id"]), ()) if n in names),
                    None,
                )
            else:
                src = c if c in names else None
            srcs.append(src)
            it = f["type"] if f else None
            convs.append(
                it
                if isinstance(it, str)
                and it in ("date", "timestamp", "timestamptz")
                else None
            )
        return _IcebergFilePartition(p, self._columns, srcs, convs)

    def _orc_partition_for(
        self, p: str, meta: dict | None, ice
    ) -> _IcebergFilePartition:
        """ORC leg of driver-side partition planning (round 12): the
        file's `iceberg.id` column attributes resolve the current
        field ids (renames project correctly); name-mapping, then
        current-name fallback for attribute-less files — mirroring
        the batch _orc_data_scan."""
        from .orc_io import read_orc_schema

        if meta is None:
            meta = _meta(self.path)
        fields = ice.IcebergTableReader._schema_fields(meta)
        fd = {f["name"]: f for f in fields}
        sch = read_orc_schema(p)
        by_id: dict[int, str] = {}
        names: set = set()
        any_ids = False
        for af in sch:
            names.add(af.name)
            fid = (af.metadata or {}).get(b"iceberg.id")
            if fid is not None:
                any_ids = True
                by_id[int(fid)] = af.name
        mapping = None
        nm = (meta.get("properties") or {}).get(
            "schema.name-mapping.default"
        )
        if nm and not any_ids:
            mapping = {
                int(e["field-id"]): e.get("names", ())
                for e in json.loads(nm)
                if "field-id" in e
            }
        srcs = []
        for c in self._columns:
            f = fd.get(c)
            if f is None:
                src = None
            elif any_ids:
                src = by_id.get(int(f["id"]))
            elif mapping is not None:
                src = next(
                    (n for n in mapping.get(int(f["id"]), ()) if n in names),
                    None,
                )
            else:
                src = c if c in names else None
            srcs.append(src)
        return _IcebergFilePartition(
            p, self._columns, orc_srcs=srcs
        )

    def read(self, partition: _IcebergFilePartition):
        if partition.avro_srcs is not None:
            # AVRO data file: stdlib decode via the by-value codec
            import datetime as dt

            def conv(kind, v):
                if v is None or kind is None:
                    return v
                if kind == "date":
                    return dt.date(1970, 1, 1) + dt.timedelta(days=v)
                if kind == "timestamptz":
                    return dt.datetime(
                        1970, 1, 1, tzinfo=dt.timezone.utc
                    ) + dt.timedelta(microseconds=v)
                return dt.datetime(1970, 1, 1) + dt.timedelta(
                    microseconds=v
                )

            _s, rows = self._read_container(partition.path)
            for r in rows:
                yield tuple(
                    conv(k, r.get(s)) if s is not None else None
                    for s, k in zip(partition.avro_srcs, partition.avro_convs)
                )
            return
        if getattr(partition, "orc_srcs", None) is not None:
            # ORC data file (round 12): pyarrow's C++ ORC reader with
            # column pruning; sources resolved driver-side by
            # `iceberg.id` attribute, renamed to current columns here
            import pyarrow.orc as orc

            srcs = partition.orc_srcs
            need = sorted({s for s in srcs if s is not None})
            f = orc.ORCFile(partition.path)
            if need:
                tbl = f.read(columns=need)
                n = tbl.num_rows
                got = {c: tbl.column(c).to_pylist() for c in need}
            else:
                n, got = f.nrows, {}
            cols = [
                got[s] if s is not None else [None] * n for s in srcs
            ]
            yield from zip(*cols)
            return
        # worker side: stdlib + pyarrow only
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        names = set(table.column_names)
        n = table.num_rows
        cols = [
            table.column(c).to_pylist() if c in names else [None] * n
            for c in partition.columns
        ]
        yield from zip(*cols)

    def commit(self, end):
        pass  # offsets are durable snapshot ordinals


class IcebergStreamDataSource(DataSource):
    """spark.readStream.format("iceberg_stream")."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_stream"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("iceberg_stream requires .option('path', ...)")
        return _spark_schema(path)

    def streamReader(self, schema) -> IcebergStreamReader:
        return IcebergStreamReader(self.options)


def register_iceberg_stream(spark) -> None:
    """Register as `iceberg_stream`; ships this module by value (its
    worker path is stdlib+pyarrow; the manifest walks lazy-import the
    package DRIVER-side only)."""
    import sys

    from pyspark import cloudpickle

    try:
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover
        pass
    spark.dataSource.register(IcebergStreamDataSource)
