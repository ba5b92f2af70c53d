"""Z-order layout: Morton-key correctness vs a pure-Python reference,
and the actual pruning payoff measured from parquet footer stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.operators import layout


def _py_spread16(x: int) -> int:
    x &= 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _py_z(x: int, y: int) -> int:
    return _py_spread16(x) | (_py_spread16(y) << 1)


def test_zkey_matches_python_reference(spark):
    pts = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 2), (65535, 65535),
           (12345, 54321), (65535, 0), (255, 256)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in layout.with_zkey(df, "x", "y", "z").collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_z(x, y), (x, y)


def test_zkey_known_values(spark):
    # z(1,0)=1, z(0,1)=2, z(1,1)=3, z(2,2)=12: the quad recursion
    df = spark.createDataFrame(
        [(1, 0), (0, 1), (1, 1), (2, 2)], "x long, y long"
    )
    vals = [r["z"] for r in layout.with_zkey(df, "x", "y", "z").orderBy("x", "y").collect()]
    assert sorted(vals) == [1, 2, 3, 12]


def test_zordered_write_bounds_both_dimensions(spark, tmp_path):
    """The pruning property itself: after write_zordered on a uniform
    (x, y) grid, per-file footer stats are tight in BOTH dimensions,
    and a selective predicate on EITHER dimension skips >= half the
    files — while a linear sort on x alone gives zero pruning on y."""
    n = 1 << 12
    grid = spark.range(n).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zpath, xpath = str(tmp_path / "zord"), str(tmp_path / "xsort")
    layout.write_zordered(grid, zpath, "x", "y", n_files=16)
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    zboxes = layout.file_bounding_boxes(zpath, ["x", "y"])
    xboxes = layout.file_bounding_boxes(xpath, ["x", "y"])
    assert len(zboxes) == 16

    # point-ish predicates on each dimension: x in [0,7], y in [0,7]
    zx = layout.pruning_fraction(zboxes, "x", 0, 7)
    zy = layout.pruning_fraction(zboxes, "y", 0, 7)
    xy = layout.pruning_fraction(xboxes, "y", 0, 7)
    assert zx >= 0.5, f"z-layout should skip most files on x, got {zx}"
    assert zy >= 0.5, f"z-layout should skip most files on y, got {zy}"
    # the x-sorted layout cannot skip anything on y (every file spans y)
    assert xy == 0.0
    # rows survive the layout intact
    assert spark.read.parquet(zpath).count() == n


def test_pruning_fraction_handles_missing_stats():
    assert layout.pruning_fraction([], "x", 0, 1) == 0.0
    boxes = [{"file": "f", "rows": 1, "x": (None, None)}]
    assert layout.pruning_fraction(boxes, "x", 0, 1) == 0.0


def test_pagerank_mass_conservation_and_uniform_cycle(spark):
    """Invariants: (a) on a dangling-free graph total rank mass stays
    exactly 1 (each iteration maps mass -> (1-d) + d*mass); (b) on a
    symmetric cycle every node ends at exactly 1/N."""
    from introduction_in_big_data_spark.operators.graph import pagerank

    n = 8
    cyc = [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)]
    df = spark.createDataFrame(cyc, "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(df, iters=4).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-8
    for v in ranks.values():
        assert abs(v - 1.0 / n) < 1e-9


def test_compact_small_files_preserves_data(spark, sf_dir, tmp_path):
    """Fragmented write → compact_files: file count collapses to the
    byte-budget target, rows/values identical, second call is a no-op."""
    from introduction_in_big_data_spark.operators.layout import (
        compact_files,
        dir_file_stats,
    )
    from introduction_in_big_data_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    p = str(tmp_path / "frag")
    orders.repartition(40).write.parquet(p)  # the streaming-sink failure mode
    assert dir_file_stats(p)["n_files"] == 40

    res = compact_files(spark, p, target_file_bytes=256 * 1024 * 1024)
    assert res["compacted"] is True
    assert res["after"]["n_files"] == 1
    assert res["after"]["rows"] == res["before"]["rows"]

    back = spark.read.parquet(p)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orders.collect())
    )

    res2 = compact_files(spark, p, target_file_bytes=256 * 1024 * 1024)
    assert res2["compacted"] is False  # idempotent


def test_compact_files_respects_target_size(spark, sf_dir, tmp_path):
    """Target smaller than total bytes → more than one output file,
    ceil(total/target) exactly."""
    from introduction_in_big_data_spark.operators.layout import (
        compact_files,
        dir_file_stats,
    )
    from introduction_in_big_data_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    p = str(tmp_path / "frag2")
    li.repartition(24).write.parquet(p)
    total = dir_file_stats(p)["bytes"]
    target = total // 3 + 1
    res = compact_files(spark, p, target_file_bytes=target)
    want = -(-total // target)
    assert res["compacted"] is True
    # coalesce merges input splits; output count equals the computed
    # target (bounded above by input file count)
    assert res["after"]["n_files"] == want
    assert res["after"]["rows"] == res["before"]["rows"]


def test_pack_zorder_grid_maps_wide_values(spark, tmp_path):
    """Columns wider than 16 bits must RANGE-MAP onto the Morton grid:
    raw values would wrap under the mask and the 'clustering' would
    be noise. Verified by the payoff: after pack_zorder on key-like
    values in the millions, per-file bounding boxes are tight enough
    that a corner box predicate prunes files."""
    from pyspark.sql import functions as F

    from introduction_in_big_data_spark.functions.zorder import pack_zorder
    from introduction_in_big_data_spark.sources.acidtable import AcidTable

    base = spark.range(0, 20000).select(
        (F.col("id") * 48271 % 1201 * 1_000_000).alias("x"),  # wide
        (F.col("id") * 16807 % 1201 * 1_000_000).alias("y"),
        (F.col("id") * 1.0).alias("v"),
    ).repartition(8)
    t = AcidTable.create(spark, str(tmp_path / "t"), base, stats=True)
    t.optimize(target_bytes=16 << 10, zorder_by=("x", "y"))
    t.read(
        predicates=[("x", "<=", 150_000_000), ("y", "<=", 150_000_000)]
    )
    assert t.last_scan["skipped_files"] > 0
