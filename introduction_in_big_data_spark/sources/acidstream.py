"""Streaming source over an AcidTable — the Delta streaming-source
analog (incremental ingest FROM a lakehouse table), built on Spark 4's
Python DataSource stream API.

Offsets are TABLE VERSIONS: micro-batch (start, end] replays exactly
the data files first referenced by commits start+1..end, one input
partition per new file, each read in the Python worker via pyarrow.
That is precisely how Delta's streaming source treats an append-only
table: new commits become new batches, file-granular, deterministic —
replaying any offset range yields identical rows, so checkpoint
recovery is exactly-once by construction.

Non-append commits (merge/delete/overwrite/optimize rewrite files
rather than only adding them): like Delta, the source REFUSES them by
default (a rewritten file would re-emit old rows as if new) and
`ignoreChanges=true` opts into skipping rewritten files — emitting only
files whose rows were never seen before is not decidable at file
granularity, which is exactly Delta's documented caveat. `optimize`
commits are always skipped whole: a pure layout change adds no rows.

Usage:
    spark.dataSource.register(AcidTableStreamDataSource)
    (spark.readStream.format("acid_table_stream")
         .option("path", "/path/to/table")
         .option("ignoreChanges", "false")
         .load())

Schema note: the stream pins the schema of the LATEST version at query
start (add_column evolution mid-stream widens later files; earlier
files project the new column as NULL, same as batch snapshot reads).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# ops whose new files are pure additions (safe to stream)
_APPEND_OPS = {"create", "append"}
# ops that only re-layout existing rows (always skipped whole)
_LAYOUT_OPS = {"optimize"}


def _pkg_feed_actions():
    """Import acidtable.feed_actions from ANY process: the stream
    reader's partitions() may run in Spark's Python planner process,
    whose sys.path need not include the repo — derive the root from
    this module's own __file__ (shipped by value / shared FS)."""
    import importlib
    import sys

    try:
        mod = importlib.import_module(
            "introduction_in_big_data_spark.sources.acidtable"
        )
    except ModuleNotFoundError:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        if root not in sys.path:
            sys.path.insert(0, root)
        mod = importlib.import_module(
            "introduction_in_big_data_spark.sources.acidtable"
        )
    return mod.feed_actions


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        columns: list[str],
        change_type: str | None = None,  # CDF: constant tag, or
        commit_version: int | None = None,  # None = read from the file
    ):
        self.path = path
        self.columns = columns
        self.change_type = change_type
        self.commit_version = commit_version


class AcidTableStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("acid_table_stream requires .option('path', ...)")
        self.log_dir = os.path.join(self.path.rstrip("/"), "_log")
        self.ignore_changes = (
            str(options.get("ignoreChanges", "false")).lower() == "true"
        )
        self.read_change_feed = (
            str(options.get("readChangeFeed", "false")).lower() == "true"
        )
        # Delta's startingVersion: replay all commits from this version
        # INCLUSIVE (deterministic backfill-from-a-version). Without
        # it, streaming starts after whatever version is latest when
        # the query resolves its initial offset — new commits only.
        sv = options.get("startingVersion")
        self._starting_version = None if sv is None else int(sv)
        with open(self._manifest_path(self._latest())) as fh:
            schema_fields = json.loads(json.load(fh)["schema"])["fields"]
        self._columns = [f["name"] for f in schema_fields]

    # -- log access (driver side) -------------------------------------------

    def _manifest_path(self, v: int) -> str:
        return os.path.join(self.log_dir, f"{v:08d}.json")

    def _latest(self) -> int:
        vs = sorted(
            int(f[:-5]) for f in os.listdir(self.log_dir) if f.endswith(".json")
        )
        if not vs:
            raise FileNotFoundError(f"not an AcidTable (no _log): {self.path}")
        return vs[-1]

    def _manifest(self, v: int) -> dict:
        with open(self._manifest_path(v)) as fh:
            return json.load(fh)

    # -- stream contract ----------------------------------------------------

    def initialOffset(self):
        # default: start AFTER the current snapshot — stream new
        # commits only (batch-read the snapshot for backfill, or pin
        # startingVersion to replay from a known commit; version 0 =
        # the create commit, i.e. the whole table history)
        if self._starting_version is not None:
            return {"version": self._starting_version - 1}
        return {"version": self._latest()}

    def latestOffset(self):
        return {"version": self._latest()}

    def _cdf_partitions(self, v0: int, v1: int) -> list:
        """readChangeFeed=true: the table's CHANGE LOG as a stream,
        micro-batched. The per-commit decision tree is
        acidtable.feed_actions — ONE implementation shared with the
        batch changes_feed so the two feeds cannot drift."""
        feed_actions = _pkg_feed_actions()
        out: list[_FilePartition] = []
        cdc_cols = self._columns + ["_change_type"]
        for v in range(v0 + 1, v1 + 1):
            m = self._manifest(v)
            prev = set() if v == 0 else set(self._manifest(v - 1)["files"])
            for tag, f in feed_actions(m, prev):
                if tag == "cdc":
                    out.append(_FilePartition(f, cdc_cols, None, v))
                else:
                    out.append(_FilePartition(f, self._columns, tag, v))
        return out

    def partitions(self, start, end):
        v0, v1 = int(start["version"]), int(end["version"])
        if self.read_change_feed:
            return self._cdf_partitions(v0, v1)
        out: list[_FilePartition] = []
        for v in range(v0 + 1, v1 + 1):
            m = self._manifest(v)
            prev = set() if v == 0 else set(self._manifest(v - 1)["files"])
            new_files = [f for f in m["files"] if f not in prev]
            op = m.get("op", "")
            if op in _LAYOUT_OPS:
                continue  # pure re-layout: no new rows by contract
            if op not in _APPEND_OPS and new_files:
                if not self.ignore_changes:
                    raise ValueError(
                        f"commit {v} is '{op}' (rewrites files); streaming "
                        "an updated table re-emits rewritten rows — set "
                        "ignoreChanges=true to skip rewritten files "
                        "(Delta's documented semantics) or stream an "
                        "append-only table"
                    )
                continue
            out.extend(_FilePartition(f, self._columns) for f in new_files)
        return out

    def read(self, partition: _FilePartition):
        # executor side: plain pyarrow scan of one immutable data file;
        # missing columns (pre-evolution files) project as None
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        names = set(table.column_names)
        cols = [
            table.column(c).to_pylist() if c in names else [None] * table.num_rows
            for c in partition.columns
        ]
        if partition.commit_version is None:
            yield from zip(*cols)
        elif partition.change_type is None:
            # CDF change file: _change_type is the last column already
            for row in zip(*cols):
                yield row + (partition.commit_version,)
        else:
            for row in zip(*cols):
                yield row + (
                    partition.change_type,
                    partition.commit_version,
                )

    def commit(self, end):
        pass  # offsets are durable table versions; nothing to ack


class AcidTableStreamDataSource(DataSource):
    """spark.readStream.format("acid_table_stream") — register with
    spark.dataSource.register(AcidTableStreamDataSource)."""

    @classmethod
    def name(cls) -> str:
        return "acid_table_stream"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("acid_table_stream requires .option('path', ...)")
        log_dir = os.path.join(path.rstrip("/"), "_log")
        vs = sorted(
            int(f[:-5]) for f in os.listdir(log_dir) if f.endswith(".json")
        )
        with open(os.path.join(log_dir, f"{vs[-1]:08d}.json")) as fh:
            schema_json = json.load(fh)["schema"]
        from pyspark.sql.types import (
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        out = StructType.fromJson(json.loads(schema_json))
        if str(self.options.get("readChangeFeed", "false")).lower() == "true":
            out = StructType(
                out.fields
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", IntegerType()),
                ]
            )
        return out

    def streamReader(self, schema) -> AcidTableStreamReader:
        return AcidTableStreamReader(self.options)


def register_acid_stream(spark) -> None:
    """Register as `acid_table_stream`, shipping this module BY VALUE
    (stdlib+pyarrow; the shared feed dispatch lazy-imports acidtable
    with a path derived from this module's own __file__) so Spark's
    planner process and an external driver's workers can unpickle the
    source without the package on their sys.path — same policy as
    deltastream/icebergstream/kafka_io."""
    import sys

    from pyspark import cloudpickle

    try:
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover
        pass
    spark.dataSource.register(AcidTableStreamDataSource)
