"""Query registry — the engine's declared, oracle-checked surface.

Every operator family from SURVEY.md §2 is exposed here as a named query
over the driver's test tables: a PySpark builder `(spark, sf_dir) ->
DataFrame` plus (where SQL-expressible) an equivalent ANSI-SQL string a
DuckDB oracle runs on the same parquet files. The driver hash-compares
the two at sf0.01; `tests/test_oracle.py` does the same at sf0.001.

Determinism rules (so order-insensitive value hashing matches):
- every computed column is aliased identically on both sides;
- floats produced by arithmetic are rounded (half-away-from-zero in
  both engines) to a fixed scale inside the query;
- every top-k / ranking query carries a unique tiebreaker column;
- sums of integers are cast to BIGINT on the DuckDB side (DuckDB sums
  to HUGEINT, Spark to LONG).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records a weaker rows-only check
    tags: tuple[str, ...] = field(default=())
    bench: bool = False  # include in bench.py headline timings


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags, bench)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand: load one driver table."""
    return load_table(spark, sf_dir, name)


# Queries that already have a driver-green (rows+schema+hash) row in
# CORRECTNESS_r01.json. The round-1 driver checked the FIRST ~50
# registry entries, so queries()/oracle_sql() now order the not-yet-
# driver-checked queries first: successive rounds sweep the whole
# registry even if each round samples a prefix. Local verification is
# unaffected — tests/test_oracle.py and the sweep artifact
# (SWEEP_r02.json) always run every query.
_R1_DRIVER_GREEN = frozenset(
    {
        "q1_pricing_summary", "top20_brands", "mktsegment_order_counts",
        "supplier_region_rollup", "clean_parts", "customer_acctbal_band",
        "year_cast_range", "zscore_outlier_counts", "sigma_band_orders",
        "dedup_first_order", "active_customers", "top5pct_parts",
        "fk_orphan_counts", "distinct_parts_ordered", "quantity_histogram",
        "quantity_summary", "quantity_percentiles", "pivot_qty_by_flag",
        "top3_parts_per_brand", "setops_customer_cohorts",
        "events_json_extract", "events_props_map", "q6_forecast_revenue",
        "events_hourly", "events_props_variant", "events_sliding_1h_30m",
        "cf_ratings", "cf_knn", "cf_predict_metrics", "cf_knn_pruned",
        "text_token_stats", "text_bpe_token_count", "text_quality",
        "text_language_id", "text_fingerprints", "text_winnow_fingerprints",
        "text_ngram_freq", "text_repetition_ratio", "corpus_composition",
        "sample_mix_by_source", "token_shard_stats", "tfidf_top_terms",
        "dedup_exact", "dedup_jaccard", "dedup_jaccard_prefix",
        "dedup_minhash_lsh", "dedup_clusters", "fuzzy_name_pairs",
        "ann_bruteforce_topk",
    }
)


def _ordered_specs() -> list[QuerySpec]:
    """Unchecked-oracle queries first, then unchecked rows-only, then
    the already-driver-green prefix from round 1."""

    def bucket(spec: QuerySpec) -> int:
        if spec.name in _R1_DRIVER_GREEN:
            return 2
        return 0 if spec.oracle else 1

    return sorted(REGISTRY.values(), key=lambda s: bucket(s))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.fn for spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    return {spec.name: spec.oracle for spec in _ordered_specs() if spec.oracle}
