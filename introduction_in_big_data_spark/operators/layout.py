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
