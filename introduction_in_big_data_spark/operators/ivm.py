"""Incremental materialized-view maintenance (IVM) for additive
aggregates — keep a grouped count/sum view consistent with a changing
base table at cost ∝ the CHANGE batch, never the base table.

The algebra is the classic signed-delta form (self-maintainable
aggregates; cf. DBSP / differential dataflow, and Delta Lake's CDF
consumption pattern): every change row carries a sign —
insert / update_postimage are +1, delete / update_preimage are −1 —
so the per-group delta of COUNT is Σsign and of SUM(x) is Σ(sign·x).
Applying the delta is a full-outer join of the (small, group-bounded)
view with the (small, group-bounded) delta; groups whose maintained
count reaches 0 leave the view, exactly matching a full recompute.

At 100 TB this is the only viable shape for a standing dashboard
aggregate over a streamed-into table: the base is never rescanned —
the change feed (sources/acidtable.AcidTable.changes(preimages=True),
sources/deltalog.DeltaLogReader.incremental, or a streaming
micro-batch) is the only input, and both IVM joins run over
group-cardinality-bounded frames.

AVG/stddev maintain as (sum, count) pairs — derive the ratio at read
time; MIN/MAX are NOT self-maintainable under deletes (a deleted
minimum forces a group rescan) and are deliberately out of scope.

Reference parity: the reference (Part_B.py counters) recomputes
aggregates per run; this module is the engine-side upgrade that keeps
those counters standing under updates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: _change_type -> sign. Post-images add, pre-images/deletes subtract.
_SIGNS = {
    "insert": 1,
    "update_postimage": 1,
    "delete": -1,
    "update_preimage": -1,
}


def aggregate_delta(
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Per-group SIGNED deltas from a change feed: `d_count` plus one
    `d_sum_<c>` per sum column. Input rows must carry a change-type
    column with values in {insert, update_postimage, delete,
    update_preimage} (an insert-only feed — e.g. an incremental
    append read — simply never uses the negative signs). One
    map-side-combinable aggregation over the change batch."""
    sign = F.col(change_type_col)
    expr = None
    for k, v in _SIGNS.items():
        expr = (
            F.when(sign == k, F.lit(v))
            if expr is None
            else expr.when(sign == k, F.lit(v))
        )
    # unknown tags fail LOUDLY — a NULL sign would silently drop the
    # row from the delta and the view would drift from a recompute
    expr = expr.otherwise(
        F.raise_error(
            F.concat(F.lit("ivm: unknown change type: "), sign)
        )
    )
    aggs = [F.sum(F.col("__sign")).alias("d_count")]
    for c in sum_cols:
        aggs.append(F.sum(F.col("__sign") * F.col(c)).alias(f"d_sum_{c}"))
    return (
        changes.withColumn("__sign", expr.cast("long"))
        .groupBy(*group_cols)
        .agg(*aggs)
    )


def apply_delta(
    view: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """The maintained view after applying `delta` (aggregate_delta's
    output): full-outer join on the group columns, add counts and
    sums with null-as-zero, drop groups whose count reaches 0. The
    view schema is `group_cols + [count_col] + sum_<c> per sum col`;
    new groups enter with their delta values. Both sides are
    group-cardinality-bounded — this never touches the base table."""
    # NULL group keys are real groups (groupBy keeps them), so the
    # join must be null-SAFE — a plain equi-join would leave the NULL
    # group's view row and delta row unmatched and the view would
    # never decrement it
    import functools

    vw, dl = view.alias("__vw"), delta.alias("__dl")
    cond = functools.reduce(
        lambda a, b: a & b,
        [vw[c].eqNullSafe(dl[c]) for c in group_cols],
    )
    merged = vw.join(dl, cond, "full_outer")
    z = lambda c: F.coalesce(c, F.lit(0))  # noqa: E731
    out_cols = [
        F.coalesce(vw[c], dl[c]).alias(c) for c in group_cols
    ]
    new_count = (z(vw[count_col]) + z(dl["d_count"])).alias(count_col)
    sums = [
        (z(vw[f"sum_{c}"]) + z(dl[f"d_sum_{c}"])).alias(f"sum_{c}")
        for c in sum_cols
    ]
    return (
        merged.select(*out_cols, new_count, *sums)
        .filter(F.col(count_col) > 0)
    )


def initial_view(
    base: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """The view's one-time full materialization (the only scan of the
    base table IVM ever needs)."""
    aggs = [F.count(F.lit(1)).alias(count_col)]
    for c in sum_cols:
        aggs.append(F.sum(c).alias(f"sum_{c}"))
    return base.groupBy(*group_cols).agg(*aggs)
