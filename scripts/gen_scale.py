#!/usr/bin/env python
"""Generate a k-times scaled benchmark dataset from an existing sf dir.

Usage: python scripts/gen_scale.py [src_dir] [dst_dir] [k]

Fact tables (customer/orders/lineitem/events/documents/embeddings) are
replicated k times with key-space offsets so referential integrity holds
copy-internally; dims (region/nation/supplier/part) are carried as-is
(dims grow sublinearly in practice, and fact FKs into them stay valid).

Per-copy content transforms keep the derived workloads honest:
  * documents: copy i>0 interleaves a copy-token between words, so no
    shingle survives across copies — dedup structure (near-dup groups,
    shingle frequency shape) is preserved per copy instead of creating
    k-clique duplicate blowup.
  * embeddings: copy i rotates the vector by i positions — norms
    preserved, directions distinct, so kNN/near-dup neighborhoods stay
    copy-local.

Bench-only data (lives under .scaledata/, gitignored); correctness runs
stay on the driver's /root/testdata.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from backend_fastapi_spark.core.session import get_spark  # noqa: E402
from backend_fastapi_spark.sources.parquet import read_table  # noqa: E402

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else ".scaledata/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

OFF = 10_000_000_000  # key offset per copy — far above any source key


def main() -> None:
    spark = get_spark("gen_scale")
    copies = spark.range(K).withColumnRenamed("id", "_copy")

    def fan(name, key_cols, extra=None):
        # read_table normalizes nanosecond timestamps (events.ts) to
        # micros; the scaled copy is written as plain TIMESTAMP, which
        # read_table passes through unchanged.
        df = read_table(spark, SRC.rstrip("/"), name).crossJoin(copies)
        for c in key_cols:
            # The offset scheme is NOT composable: running this script on
            # its own output would make copies (i, j) and (j, i) collide
            # on base + (i+j)*OFF — duplicate keys that silently corrupt
            # every id-keyed result (found as an ANSI divide-by-zero in
            # Jaccard union sizes at a composed "sf10"). Generate every
            # scale point directly from the BASE testdata instead.
            src_max = df.agg(F.max(c)).collect()[0][0]
            if src_max is not None and src_max >= OFF:
                raise SystemExit(
                    f"{name}.{c} max {src_max} >= OFF {OFF}: source already "
                    f"offset (composed run?) — regenerate from base testdata "
                    f"with a larger K instead"
                )
            df = df.withColumn(c, F.col(c) + F.col("_copy") * F.lit(OFF))
        if extra is not None:
            df = extra(df)
        df.drop("_copy").repartition(32).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )

    def doc_text(df):
        # suffix every token with a per-copy marker for copies > 0: two
        # docs in copy i share a shingle iff they shared it in copy 0, so
        # the dup structure (near-dup groups, shingle frequency shape) is
        # EXACTLY the source's, replicated k times. (An earlier interleave
        # variant created (marker, word, marker) shingles shared across a
        # whole copy — 37x edge blowup at 10x data instead of 10x.)
        return df.withColumn(
            "text",
            F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text"),
                    r"(\S+)",
                    F.concat(F.lit("$1_c"), F.col("_copy")),
                )
            ),
        )

    def rademacher_vec(df):
        # Per-copy Rademacher diagonal: component k of copy c flips sign
        # iff md5("c:k") is odd. Within a copy BOTH sides of any pair get
        # the same diagonal, so every within-copy dot product — and
        # therefore the whole near-dup/kNN structure — is preserved
        # EXACTLY, k times. Cross-copy cosines become ±-random sums that
        # concentrate near 0, so neighborhoods stay copy-local at ANY K.
        # (The earlier rotation transform kept cross-copy cosines high —
        # rotations of smooth vectors correlate — which made pair-output
        # cardinality quadratic in K instead of linear; sign diagonals
        # have no such alignment. Norms unchanged either way.)
        sign = (
            "transform(embedding, (x, k) -> CASE WHEN _copy = 0 THEN x "
            "WHEN substr(md5(concat(CAST(_copy AS STRING), ':', "
            "CAST(k AS STRING))), 1, 1) IN ('1','3','5','7','9','b','d','f') "
            "THEN -x ELSE x END)"
        )
        return df.withColumn("embedding", F.expr(sign))

    fan("customer", ["c_custkey"])
    fan("orders", ["o_orderkey", "o_custkey"])
    fan("lineitem", ["l_orderkey"])
    fan("events", ["event_id", "user_id"])
    fan("documents", ["doc_id"], doc_text)
    fan("embeddings", ["vec_id"], rademacher_vec)
    for dim in ["region", "nation", "supplier", "part"]:
        spark.read.parquet(f"{SRC}/{dim}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{dim}.parquet"
        )
    print("done:", DST)


if __name__ == "__main__":
    main()
