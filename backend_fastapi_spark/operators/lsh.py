"""Approximate nearest neighbors via MLlib LSH — the 100 TB similarity path.

Exact kNN (vector.py) scans the corpus per query batch; past the point
where |Q|·|corpus| scoring dominates, switch to
``BucketedRandomProjectionLSH``: fit once (random hyperplane projections,
deterministic with a seed), bucket both sides, and only colliding buckets
join. This is the MLlib analog of the reference's FAISS index
(``enhanced_internal_db_service.py:602-630``) — batch-built, columnar,
persistable (S11/S12: model.save + bucketed parquet).
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    bucket_length: float = 0.5,
    num_tables: int = 4,
    seed: int = 42,
):
    """Fit the projection model on (id, embedding ARRAY<FLOAT>)."""
    with_vec = df.withColumn("features", array_to_vector(F.col(vec_col)))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=seed,
    )
    return lsh.fit(with_vec), with_vec


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by L2 distance for one query vector."""
    from pyspark.ml.linalg import Vectors

    model, with_vec = fit_lsh(df, vec_col)
    return model.approxNearestNeighbors(
        with_vec, Vectors.dense(query_vec), k, distCol="dist"
    ).drop("features", "hashes")


def ann_similarity_join(
    df: DataFrame,
    max_dist: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate all-pairs within L2 ``max_dist`` — LSH-pruned self-join
    (only colliding buckets meet), the scale form of near-dup search."""
    model, with_vec = fit_lsh(df, vec_col)
    joined = model.approxSimilarityJoin(with_vec, with_vec, max_dist, distCol="dist")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.col("dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


# ---------------------------------------------------------------------------
# Deterministic random-projection LSH (round 5)
#
# MLlib's BucketedRandomProjectionLSH draws hyperplanes from a JVM-seeded
# RNG — deterministic per JVM but not reproducible in another engine, so
# its candidates can only ever be rows-only-checked. The signed-projection
# family below derives every hyperplane component from md5 (Rademacher
# ±1 per (table, plane, dim)) and takes every sign decision in int64
# fixed-point — the bucketing, the candidate set, and the verify scores
# are all EXACTLY reproducible in any engine (driver hash-checkable SQL
# oracle). Same scale shape as MinHash banding: one narrow projection
# pass, one equi-join on exploded (table, bucket) keys, exact verify on
# collisions only. Recall knob = tables × planes (collision probability
# per plane is 1 - theta/pi — classic SRP/SimHash-for-cosine).
# ---------------------------------------------------------------------------

import hashlib as _hashlib

from backend_fastapi_spark.operators.vector import FIXED_SCALE


def rp_planes(dim: int, n_tables: int, n_planes: int) -> list[list[list[int]]]:
    """Rademacher hyperplanes H[t][p][d] in {-1, +1}, each component the
    md5 parity of "t|p|d" — a pure function, identical everywhere."""
    return [
        [
            [
                1 if _hashlib.md5(f"{t}|{p}|{d}".encode()).digest()[0] & 1 else -1
                for d in range(dim)
            ]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def rp_near_dup_pairs(
    df: DataFrame,
    threshold_i64: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 4,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate near-dup pairs with fully deterministic LSH: rows
    colliding in at least one table's bucket are verified with the exact
    fixed-point dot; pairs at or above ``threshold_i64`` survive.

    Plan shape: quantize once (narrow), n_tables×n_planes codegen'd
    integer aggregates → bucket ids, ONE equi-join on the exploded
    (table, bucket) key — never all-pairs, no model fit, no UDF.
    """
    planes = rp_planes(dim, n_tables, n_planes)
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * FIXED_SCALE).cast("long"),
    )
    base = df.select(F.col(id_col).alias("_id"), q.alias("_q"))

    def bucket(t: int):
        bits = None
        for p in range(n_planes):
            h = F.array(*[F.lit(v) for v in planes[t][p]])
            dot = F.aggregate(
                F.zip_with(F.col("_q"), h, lambda x, s: x * s),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            bit = (dot >= 0).cast("long") * F.lit(1 << p)
            bits = bit if bits is None else bits + bit
        return bits

    # Collision join carries IDS ONLY: a near-identical pair collides in
    # most tables, so scoring inside the join would redo the 64-multiply
    # dot per collision and shuffle the 64-long arrays t× per row. Dedup
    # the (id_a, id_b) set first, then attach the quantized vectors once
    # per unique pair and score once.
    keyed = base.select(
        "_id",
        F.posexplode(F.array(*[bucket(t) for t in range(n_tables)])).alias(
            "t", "bucket"
        ),
    )
    pair_ids = (
        keyed.select(F.col("_id").alias("id_a"), "t", "bucket")
        .join(keyed.select(F.col("_id").alias("id_b"), "t", "bucket"),
              ["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    scored = (
        pair_ids.join(base.select(F.col("_id").alias("id_a"),
                                  F.col("_q").alias("_qa")), "id_a")
        .join(base.select(F.col("_id").alias("id_b"),
                          F.col("_q").alias("_qb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.aggregate(
                F.zip_with("_qa", "_qb", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("score_i64"),
        )
    )
    return scored.filter(F.col("score_i64") >= threshold_i64)
