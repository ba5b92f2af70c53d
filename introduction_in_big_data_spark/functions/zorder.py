"""Z-order (Morton) curve keys — multi-dimensional data clustering
for scan pruning (the Spark-native analog of Delta/Iceberg
``ZORDER BY`` / ``sort_order`` rewrites; no reference analog —
/root/reference has no layout management at all).

Why this matters at 100 TB: parquet readers prune row groups with
min/max statistics, but a sort on (a, b) only gives pruning power on
`a`. Interleaving the bits of both dimensions into one key and
range-sorting by it bounds EVERY file in BOTH dimensions (each file
covers a small quad of the (a, b) plane), so selective predicates on
either — or both — dimensions skip most files. The interleave is pure
integer shift/mask arithmetic: whole-stage-codegen JVM expressions
here, byte-identical SQL in the DuckDB oracle (same shifts), no UDF.

Layout write path: `operators.layout.write_zordered`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# magic-number bit spreading (the standard Morton construction): after
# these four mask-shift rounds the 16 low bits of x occupy the even bit
# positions of a 32-bit lane
_SPREAD_ROUNDS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of `c` so bit i lands at position 2i."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_ROUNDS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def z_interleave16(x: Column, y: Column) -> Column:
    """Morton key of two unsigned 16-bit values: bits of `x` at even
    positions, bits of `y` at odd positions — a 32-bit key whose prefix
    order recursively tiles the (x, y) plane into quads."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def zorder_key2(x: Column, y: Column, bits: int = 16) -> Column:
    """Z-key for two non-negative integer dimension columns, each
    first reduced to `bits` bits by masking (callers map raw values
    onto a bounded grid first — e.g. pmod or epoch-bucketing)."""
    mask = (1 << bits) - 1
    return z_interleave16(x.bitwiseAND(F.lit(mask)), y.bitwiseAND(F.lit(mask)))


def zorder_key_column(df, cols: tuple[str, str], key_col: str = "__zkey"):
    """Attach the z-curve key of two columns as `key_col`: each column
    RANGE-MAPS onto the 16-bit grid zorder_key2 requires (min/max from
    one tiny aggregate; raw values wider than 16 bits would wrap under
    the mask and turn the clustering into noise — the documented
    caller contract, enforced here once for every maintenance path).
    Shared by pack_zorder and the partitioned Iceberg compaction
    (which clusters on the key WITHIN each partition)."""
    x, y = cols
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(x), F.max(x), F.min(y), F.max(y)
    ).collect()[0]

    def grid(c: Column, lo, hi) -> Column:
        if lo is None or hi is None or hi == lo:
            return F.lit(0)
        span = float(hi - lo)
        return F.floor(
            (c.cast("double") - F.lit(float(lo))) / F.lit(span) * 65535
        ).cast("long")

    return df.withColumn(
        key_col,
        zorder_key2(grid(F.col(x), lo_x, hi_x), grid(F.col(y), lo_y, hi_y)),
    )


def pack_zorder(df, n_out: int, cols: tuple[str, str]):
    """Cluster `df` on the z-curve of two columns for an OPTIMIZE
    ZORDER-style rewrite: range-partition into `n_out` z-ordered
    output partitions. Shared by AcidTable.optimize,
    DeltaLogReader.optimize and IcebergTableReader.compact."""
    return (
        zorder_key_column(df, cols)
        .repartitionByRange(n_out, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )


def spread16_sql(expr: str) -> str:
    """The same _spread16 arithmetic as ANSI SQL text (DuckDB oracle
    twin) — keep in lockstep with _SPREAD_ROUNDS."""
    x = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD_ROUNDS:
        x = f"((({x} | ({x} << {shift}))) & {mask})"
    return x


def z_interleave16_sql(x_expr: str, y_expr: str) -> str:
    return f"({spread16_sql(x_expr)} | ({spread16_sql(y_expr)} << 1))"
