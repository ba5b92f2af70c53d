"""Data-layout management: Z-ordered writes for multi-dimensional
scan pruning (the OPTIMIZE ... ZORDER BY analog, expressed with plain
Spark primitives — no table format required).

The write path is two stages, both scale-linear:
  1. compute the Morton key (codegen arithmetic, zero shuffle),
  2. `repartitionByRange(n, zkey)` — one range-exchange (sampled
     boundaries) — then sort WITHIN each partition by the key and
     write one file per partition.
Every output file then covers one contiguous z-range = a small quad
of the (x, y) plane, so its parquet min/max stats are tight in BOTH
dimensions and selective predicates on either dimension skip most
files. `file_bounding_boxes` reads the actual parquet footers to
measure that tightness — tests assert the pruning property instead of
trusting the construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.zorder import zorder_key2


def with_zkey(
    df: DataFrame, xcol: str, ycol: str, out: str = "zkey", bits: int = 16
) -> DataFrame:
    return df.withColumn(out, zorder_key2(F.col(xcol), F.col(ycol), bits))


def write_zordered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write `df` as parquet clustered on the Z-curve of (xcol, ycol).

    The z-key is dropped before writing — it is a layout artifact, not
    data; re-derivable from the dimensions at any time."""
    (
        with_zkey(df, xcol, ycol, "__zkey", bits)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_bounding_boxes(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max of `cols` from the parquet FOOTER stats (what a
    reader's row-group pruning actually sees) — driver-side metadata
    only, no data read."""
    import glob as _glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        box = {"file": f.rsplit("/", 1)[-1], "rows": md.num_rows}
        for ci in range(md.num_columns):
            rg0 = md.row_group(0)
            name = rg0.column(ci).path_in_schema
            if name not in cols:
                continue
            lo, hi = None, None
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            box[name] = (lo, hi)
        out.append(box)
    return out


def pruning_fraction(
    boxes: list[dict], col: str, lo, hi
) -> float:
    """Fraction of files a [lo, hi] predicate on `col` can SKIP, given
    footer bounding boxes — the measurable payoff of the layout."""
    if not boxes:
        return 0.0
    skipped = sum(
        1
        for b in boxes
        if b.get(col) and b[col][0] is not None and (b[col][1] < lo or b[col][0] > hi)
    )
    return skipped / len(boxes)


def dir_file_stats(path: str) -> dict:
    """Driver-side parquet-footer census of a directory: file count,
    total bytes, rows — the signal a compaction policy reads. Metadata
    only; at real scale this is the table-format manifest listing."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(f"{path}/part-*.parquet"))
    rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    size = sum(_os.path.getsize(f) for f in files)
    return {"n_files": len(files), "bytes": size, "rows": rows}


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    sort_within_by: list[str] | None = None,
) -> dict:
    """Small-file compaction (the OPTIMIZE/bin-packing analog for a
    plain parquet directory): rewrite `path` into
    ceil(total_bytes / target_file_bytes) files.

    Small files are the classic large-pipeline failure mode — a
    streaming sink or over-parallel write leaves thousands of KB-scale
    files, and every downstream scan pays per-file open/footer/schedule
    cost. Policy: footer census first (metadata only); skip when the
    directory is already within budget (idempotent — a second call is
    a no-op). The rewrite uses `coalesce` when shrinking (narrow — no
    shuffle; each output task concatenates input splits) and falls
    back to `repartition` only when growing the file count (splitting
    requires a shuffle). `sort_within_by` optionally restores
    clustering (footer min/max tightness) during the same pass — by
    default compaction preserves bytes, not order.

    Writes to a temp sibling dir then atomically swaps via rename, so
    a failed compaction never destroys the input. Returns
    {before, after} censuses."""
    import os as _os
    import shutil as _shutil

    before = dir_file_stats(path)
    n_target = max(1, -(-before["bytes"] // target_file_bytes))
    if before["n_files"] <= max(n_target, min_files_to_compact - 1):
        return {"before": before, "after": before, "compacted": False}

    df = spark.read.parquet(path)
    if n_target < before["n_files"]:
        df = df.coalesce(n_target)
    else:  # pragma: no cover - growing is the rare path
        df = df.repartition(n_target)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)

    tmp = path.rstrip("/") + "__compact_tmp"
    df.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__compact_old"
    _os.rename(path, old)
    _os.rename(tmp, path)
    _shutil.rmtree(old)
    return {"before": before, "after": dir_file_stats(path), "compacted": True}
