#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line {"metric", "value", "unit", "queries", "sf", ...}.

Each query is executed to completion (count() forces the full plan; results
stay distributed — no driver-side collect of payload rows).

Besides timings the line carries the context needed to read a swing without
re-running anything (VERDICT r04 directives #3/#7):
  "data"          — per-table row/byte counts of the input dir, so a
                    testdata regeneration is visible in the artifact;
  "cardinalities" — result row count per timed query (candidate-pair and
                    cluster counts are exactly these numbers);
  "cc_stats"      — edge/round counts from connected_components for the
                    queries that run it (cost ∝ edges × rounds).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

from backend_fastapi_spark.core.session import get_spark
from backend_fastapi_spark import queries as Q
from backend_fastapi_spark.operators import dedup as D

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

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

# Round-2+ corpus-pipeline operators, timed separately so the headline
# total stays comparable to BENCH_r01.
EXTRA = [
    "dup_clusters",
    "dedup_canonical_corpus",
    "embedding_near_dup_rp",
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
]

# Queries whose plan runs connected_components — snapshot its stats.
CC_QUERIES = {"dup_clusters", "dedup_canonical_corpus"}


def data_stanza(spark, sf_dir: str) -> dict:
    """One count + directory size per table: makes a data regeneration
    visible in the artifact instead of inferred from commit messages."""
    out = {}
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            continue
        files = [path] if os.path.isfile(path) else glob.glob(f"{path}/**/*", recursive=True)
        out[t] = {
            "rows": spark.read.parquet(path).count(),
            "bytes": sum(os.path.getsize(f) for f in files if os.path.isfile(f)),
        }
    return out


def time_set(spark, names, sf_dir, runs, timings, cards, cc_stats, tag=""):
    for name in names:
        spec = Q.REGISTRY.get(name)
        if spec is None:
            continue
        rows = spec.fn(spark, sf_dir).count()  # warmup: JIT/codegen, footers
        best = float("inf")
        for _ in range(runs):  # min-of-N damps transient host noise
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        cards[name] = rows
        if name in CC_QUERIES and D.LAST_CC_STATS:
            cc_stats[name] = {
                k: v for k, v in D.LAST_CC_STATS.items() if k != "changed_per_round"
            } | {"changed_per_round": list(D.LAST_CC_STATS["changed_per_round"])}
        print(f"# {tag}{name}: {timings[name]:.3f}s rows={rows}", file=sys.stderr)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    # Warm the JVM + parquet footers once so timings measure the queries;
    # the data stanza doubles as the warmup pass.
    data = data_stanza(spark, sf_dir)

    cards: dict[str, int] = {}
    cc_stats: dict[str, dict] = {}

    timings: dict[str, float] = {}
    time_set(spark, HEADLINE, sf_dir, 3, timings, cards, cc_stats)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "data": data,
    }

    # Each section stands alone: drop the shared substrate caches so a
    # section's timings never pay (or profit from) another section's
    # storage-memory pressure.
    spark.catalog.clearCache()

    extra: dict[str, float] = {}
    time_set(spark, EXTRA, sf_dir, 2, extra, cards, cc_stats, tag="extra ")
    out["extra_queries"] = extra

    # Optional 10x scale point (scripts/gen_scale.py output): one timed run
    # per query so sf-growth is recorded alongside the primary metric.
    # Includes the CC-running extras — their at-scale growth is the open
    # question (round-2 directive #8).
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", ".scaledata/sf1")
    if os.path.isdir(sf1_dir) and os.path.abspath(sf1_dir) != os.path.abspath(sf_dir):
        spark.catalog.clearCache()
        sf1_cc: dict[str, dict] = {}
        sf1_timings: dict[str, float] = {}
        sf1_cards: dict[str, int] = {}
        time_set(spark, HEADLINE, sf1_dir, 2, sf1_timings, sf1_cards, sf1_cc, tag="sf1 ")
        out["sf1_queries"] = sf1_timings
        out["sf1_total"] = round(sum(sf1_timings.values()), 3)
        spark.catalog.clearCache()
        sf1_extra: dict[str, float] = {}
        time_set(
            spark,
            ["dup_clusters", "dedup_canonical_corpus", "decontaminate_test_split",
             "gopher_repetition_filter", "train_test_split_counts",
             "embedding_near_dup_rp",
             "events_burst_60s", "funnel_conversion", "next_order_asof_forward"],
            sf1_dir, 1, sf1_extra, sf1_cards, sf1_cc, tag="sf1-extra ",
        )
        out["sf1_extra_queries"] = sf1_extra
        out["sf1_cardinalities"] = sf1_cards
        out["sf1_cc_stats"] = sf1_cc
        out["sf1_data"] = data_stanza(spark, sf1_dir)

    out["cardinalities"] = cards
    out["cc_stats"] = cc_stats

    print(json.dumps(out))


if __name__ == "__main__":
    main()
