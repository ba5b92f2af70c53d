"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic document corpus, generated per-partition on the executors —
no files, no driver materialization. The scale-test pattern: point any
text operator at a corpus of arbitrary size with one option change.

Usage:
    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("n_docs", 10_000).option("n_partitions", 8)
          .option("seed", 7).load())

Determinism contract: content is a pure function of (doc_id, seed) via
a splitmix64-style integer mixer (no Python `random`, whose sequence
is a per-version implementation detail) — the same options always
yield the same corpus, on any worker, in any partition order.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_WORDS = (
    "data spark shuffle partition columnar vector query join scan "
    "filter window stream batch schema parquet arrow codegen stage "
    "task executor broadcast hash sort merge agg sketch sample"
).split()

_LANGS = ("en", "de", "fr", "el")


def _mix64(x: int) -> int:
    """splitmix64 finalizer — stable across platforms/versions."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def doc_for(doc_id: int, seed: int) -> tuple[int, str, str]:
    """The (doc_id, text, lang) row — pure function, also usable from
    tests to compute expected content without Spark."""
    h = _mix64(doc_id * 1_000_003 + seed)
    n_words = 20 + h % 60
    words = []
    w = h
    for _ in range(n_words):
        w = _mix64(w)
        words.append(_WORDS[w % len(_WORDS)])
    return doc_id, " ".join(words), _LANGS[h % len(_LANGS)]


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("n_partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = (self.n_docs + self.n_parts - 1) // self.n_parts
        return [
            _RangePartition(i * per, min((i + 1) * per, self.n_docs), self.seed)
            for i in range(self.n_parts)
            if i * per < self.n_docs
        ]

    def read(self, partition: _RangePartition):
        for doc_id in range(partition.start, partition.end):
            yield doc_for(doc_id, partition.seed)


class SyntheticDocsStreamReader(DataSourceStreamReader):
    """Spark 4 STREAMING Python DataSource (§2.9 × §2.10): the same
    deterministic corpus arriving `docs_per_batch` docs per micro-batch
    until `n_docs` — a bounded, replayable rate-style source whose
    content is a pure function of (doc_id, seed).

    Offset contract (exactly-once): an offset is the count of docs
    emitted so far ({"pos": n}); `latestOffset` advances the cap one
    batch at a time, `partitions(start, end)` splits [start, end) into
    range tasks, and replaying any (start, end) yields identical rows —
    so recovery from a checkpoint re-reads the SAME batch (the property
    checkpoint tests rely on). `commit` is a no-op: nothing upstream to
    acknowledge; determinism makes re-reads safe instead."""

    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.per_batch = int(options.get("docs_per_batch", 100))
        self.n_parts = int(options.get("n_partitions", 2))
        self.seed = int(options.get("seed", 42))
        self._cap = 0

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        self._cap = min(self._cap + self.per_batch, self.n_docs)
        return {"pos": self._cap}

    def partitions(self, start, end):
        s, e = int(start["pos"]), int(end["pos"])
        n = max(1, self.n_parts)
        per = max(1, (e - s + n - 1) // n)
        return [
            _RangePartition(p, min(p + per, e), self.seed)
            for p in range(s, e, per)
        ]

    def read(self, partition: _RangePartition):
        for doc_id in range(partition.start, partition.end):
            yield doc_for(doc_id, partition.seed)

    def commit(self, end):
        pass


class SyntheticDocsDataSource(DataSource):
    """spark.read.format("synthetic_docs") — register with
    spark.dataSource.register(SyntheticDocsDataSource). Also a
    streaming source: spark.readStream.format("synthetic_docs")."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id long, text string, lang string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def streamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)
