#!/usr/bin/env python
"""Scale-up probe: measure how the headline plans behave at 10x the
bench data (sf0.1 -> "sf1"), the empirical check behind the 100 TB
design claims (SCALE.md records results).

Builds an sf1-equivalent star schema under /tmp by unioning 10
key-shifted copies of the sf0.1 tables (foreign keys shifted
consistently so join fan-outs are preserved: each copy is a disjoint
replica of the original graph — selectivities, group counts per key,
and join multiplicities all match sf0.1 exactly, so wall-clock ratios
isolate the engine's scaling, not a changed workload).

Prints one JSON line:
  {"metric": "scale_ratio_10x", "queries": {name: {"t1": s, "t10": s,
   "ratio": r}}, ...}

A plan that scales linearly shows ratio <= ~10 (usually well under:
fixed per-query cost amortizes); a super-linear operator (quadratic
join, single-partition sort) shows ratio >> 10 and is a bug.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from introduction_in_big_data_spark import plans  # noqa: E402
from introduction_in_big_data_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/ibd_scale/sf1_v3"  # v3: events now key-shifted too (kafka probe)
COPIES = 10
SHIFT = 1_000_000_000  # key shift per copy; far above any real key

# key columns to shift per table (consistent across fact/dim so every
# copy joins only within itself)
KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],  # copies reuse the vectors; ANN top-k
    # probes keep the ORIGINAL 10-query set (vec_id < 10 exists only in
    # copy 0), so corpus work scales 10x while |Q| stays fixed — the
    # deployment shape. (Near-dup pair probes would NOT be valid on
    # this build: identical vectors across copies cross-match, growing
    # candidates by COPIES² — a changed workload, not a scaled one.)
}
UNKEYED = ["nation", "region"]  # tiny dims: single copy, keys unshifted

PROBE_QUERIES = [
    "q1_pricing_summary",      # scan + hash agg
    "top20_brands",            # broadcast dim join + TakeOrdered
    "q3_shipping_priority",    # multiway broadcast join
    "q5_region_revenue",       # star join, fact never pre-shuffles
    "top5pct_parts",           # r2 threshold plan (no global window)
    "skew_join_unsalted",      # hot-key sort-merge (AQE skew path)
    "skew_join_salted",        # salted twin
    "dedup_exact",             # documents hash-agg dedup
    "dedup_jaccard",           # shingle self-join, Σn² bounded by cap
    "dedup_minhash_lsh",       # signatures + band join + verify
    "text_token_stats",        # regex scan stage
    "cf_knn_pruned",           # CF headline: self-join Σn² is linear in
                               # disjoint copies — the probe proves it
    "tfidf_top_terms",         # one corpus explode + term-window df(t)
    "substring_dup_stats",     # content-defined char grams, df group-by
    "pagerank_trade_graph",    # 5 iterations, lineage-truncated loop
    "text_char_lm_quality",    # r3-cont: trigram LM train+score; the
                               # dictionary is charset-bounded, so only
                               # the gram stream grows with the corpus
    "multimodal_jpeg_stats",   # r3-cont: per-doc encode+decode kernels,
                               # embarrassingly parallel
    "acid_merge_customers",    # r3-cont: COW MERGE — cost ∝ files hit,
                               # both table and update batch scale 10x
    "ann_sq8_topk",            # r3-cont2: int8 brute force — corpus scan
                               # 10x, broadcast query set fixed
    "ann_pq_topk_fixed",       # r3-cont2: ADC over 4-byte codes, encode
                               # is a per-row map — linear by design
    "ann_pq_refined_topk",     # r3-cont2: shortlist stays |Q|x100, so
                               # ONLY the ADC stage should grow
    "cap_docs_per_source",     # r3-cont2: WindowGroupLimit map-side cap
    "triangle_count_copurchase",  # r3-cont3: degree-ordered wedge join —
                               # copies are key-disjoint so edges AND
                               # wedges scale ~10x; super-linear would
                               # mean the orientation bound failed
    "sequence_pack_stats",     # r3-cont3: per-group applyInPandas packing
    "daily_revenue_anomalies", # r3-cont3: trailing window on daily rollup
    "acid_changes_feed",       # r3-cont3: snapshot full-outer diff
    "ann_ivf_topk",            # r4 (VERDICT r3 item 7): the PRODUCTION
                               # IVF kernel — trained centroids broadcast
                               # + vectorized pandas_udf scoring; the
                               # frozen-literal twin pays ~8s constant
                               # codegen and exists for hash-checking,
                               # THIS is the path whose scaling matters
    "ann_lsh_topk",            # r4: production LSH kernel — one Arrow
                               # numpy matmul for signatures, bucket
                               # equi-join, verify candidates only
    "bpe_train_merges",        # r4: rounds run over the word-frequency
                               # dictionary — only the one corpus scan
                               # should grow (the text-disjoint build
                               # grows vocab 10x too via ~i suffixes,
                               # still dictionary-bounded)
    "avro_roundtrip_stats",    # r4: executor-side container writes +
                               # one-task-per-file Python decode —
                               # embarrassingly parallel both ways
    "delta_interop_read",      # r4: driver-side log replay is O(files);
                               # the data plan is pruned parquet scans
    "iceberg_interop_read",    # r4: metadata walk is O(manifests);
                               # data plan = explicit-file parquet scan
    "acid_optimize_compaction",  # r4: rewrite cost ∝ bytes compacted
    "bpe_encode_stats",        # r4: encode = vocab-bounded dictionary
                               # fold + broadcast join on token stream
    "delta_dml_merge_read",    # r5: external-Delta MERGE — staging
                               # scales 10x; the merge itself is hit-
                               # file-bounded (stats prune + semi-join)
    "iceberg_dml_upsert_read", # r5: merge-on-read upsert — ZERO files
                               # rewritten or scanned; cost = staging +
                               # one eq-delete + one append
    "incremental_mv_maintenance",  # r5: IVM — one base scan at
                               # materialize; maintenance joins are
                               # group-cardinality-bounded
    "delta_cdf_mv_maintenance",  # r5 s3: CDF write (3 DML commits) +
                               # changes() replay + IVM fold — the
                               # feed volume, not the table, grows
    "iceberg_maintenance_read",  # r5 s3: delete + upsert + compact +
                               # expire — compaction rewrite is the
                               # only O(table) stage, by design
    "stream_iceberg_source_counts",  # r5 s3: snapshot-ordinal batches;
                               # manifest diffs are driver metadata,
                               # reads are per-file pyarrow tasks
    "stream_kafka_event_counts",  # r5 s3: wire-protocol round trip —
                               # Spark-side work is per-partition
                               # parallel; the pure-Python MiniKafka
                               # broker (single process, CRC in
                               # Python) is the expected bottleneck
                               # and exists only for testing
]


def build_sf1(spark) -> None:
    if os.path.exists(os.path.join(OUT, "_SUCCESS")):
        return
    os.makedirs(OUT, exist_ok=True)
    from introduction_in_big_data_spark.sources.tables import load_table

    for name, keys in KEYED.items():
        src = load_table(spark, BASE, name)
        parts = []
        for i in range(COPIES):
            c = src
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if name == "documents" and i > 0:
                # tag every token with the copy id so copies are
                # text-disjoint too: without this, identical texts
                # across copies cross-match in the shingle/band joins
                # (candidate pairs grow with COPIES², a CHANGED workload,
                # not a scaled one). Tagging preserves per-copy token
                # counts, shingle structure and df(t) shapes exactly.
                c = c.withColumn(
                    "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1~{i}")
                )
            parts.append(c)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
    for name in UNKEYED:
        load_table(spark, BASE, name).write.mode("overwrite").parquet(
            f"{OUT}/{name}.parquet"
        )
    Path(os.path.join(OUT, "_SUCCESS")).touch()


def time_query(spark, name: str, sf_dir: str) -> float:
    spec = plans.REGISTRY[name]
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    only = set(sys.argv[1:])  # optional subset: scale_probe.py q1 q2 ...
    spark = get_spark("ibd-scale-probe")
    build_sf1(spark)
    # warmup
    plans.REGISTRY[PROBE_QUERIES[0]].fn(spark, BASE).count()
    results = {}
    for name in PROBE_QUERIES:
        if only and name not in only:
            continue
        t1 = time_query(spark, name, BASE)
        t10 = time_query(spark, name, OUT)
        results[name] = {
            "t1": round(t1, 3),
            "t10": round(t10, 3),
            "ratio": round(t10 / t1, 2) if t1 > 0 else None,
        }
        print(f"# {name}: {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})", file=sys.stderr)
    print(
        json.dumps(
            {"metric": "scale_ratio_10x", "copies": COPIES, "queries": results}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
