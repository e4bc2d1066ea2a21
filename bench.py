#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is executed to completion (count() forces the full plan; results
stay distributed — no driver-side collect of payload rows).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from backend_fastapi_spark.core.session import get_spark
from backend_fastapi_spark import queries as Q

# Headline set: one per major operator family (join/agg/window/sort/vector/
# text). Kept stable across rounds so BENCH_r{N}.json is comparable.
HEADLINE = [
    "user_context_star",
    "pricing_summary",
    "region_revenue",
    "per_customer_top3_orders",
    "daily_value_by_type",
    "diversified_docs",
    "multi_key_sort",
    "keyword_or_filter",
    "knn_batch_top5",
    "embedding_near_dup",
    "chunk_documents",
    "ngram_jaccard_dupes",
    "minhash_lsh_candidates",
    "lang_quality_score",
    "rag_retrieval_pipeline",
    "sessionize_events",
    "ts_interpolated",
    "customer_360",
    "simhash_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    # Warm the JVM + parquet footers once so timings measure the queries.
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        spec = Q.REGISTRY.get(name)
        if spec is None:
            continue
        spec.fn(spark, sf_dir).count()  # warmup: JIT/codegen, parquet footers
        best = float("inf")
        for _ in range(3):  # min-of-3 damps transient host noise
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        dt = round(best, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    # Each section stands alone: drop the shared substrate caches so a
    # section's timings never pay (or profit from) another section's
    # storage-memory pressure.
    spark.catalog.clearCache()

    # Round-2+ corpus-pipeline operators, timed separately so the headline
    # total stays comparable to BENCH_r01.
    extra: dict[str, float] = {}
    for name in [
        "dup_clusters",
        "dedup_canonical_corpus",
        "decontaminate_test_split",
        "gopher_repetition_filter",
        "train_test_split_counts",
        "weighted_sample_docs",
        "multimodal_feature_stats",
        "events_burst_60s",
        "funnel_conversion",
        "shipping_priority",
        "returned_items_by_customer",
        "next_order_asof_forward",
    ]:
        spec = Q.REGISTRY.get(name)
        if spec is None:
            continue
        spec.fn(spark, sf_dir).count()  # warmup
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        extra[name] = round(best, 3)
        print(f"# extra {name}: {extra[name]:.3f}s", file=sys.stderr)
    out["extra_queries"] = extra

    # Optional 10x scale point (scripts/gen_scale.py output): one timed run
    # per query so sf-growth is recorded alongside the primary metric.
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", ".scaledata/sf1")
    if os.path.isdir(sf1_dir) and os.path.abspath(sf1_dir) != os.path.abspath(sf_dir):
        spark.catalog.clearCache()
        sf1_timings: dict[str, float] = {}
        for name in HEADLINE:
            spec = Q.REGISTRY.get(name)
            if spec is None:
                continue
            spec.fn(spark, sf1_dir).count()  # warmup
            best = float("inf")
            for _ in range(2):  # min-of-2: damps cache-churn spikes
                t0 = time.perf_counter()
                spec.fn(spark, sf1_dir).count()
                best = min(best, time.perf_counter() - t0)
            sf1_timings[name] = round(best, 3)
            print(f"# sf1 {name}: {sf1_timings[name]:.3f}s", file=sys.stderr)
        out["sf1_queries"] = sf1_timings
        out["sf1_total"] = round(sum(sf1_timings.values()), 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
