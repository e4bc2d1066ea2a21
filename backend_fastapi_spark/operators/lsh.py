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
