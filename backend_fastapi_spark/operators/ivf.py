"""IVF-style approximate nearest neighbors: KMeans coarse quantizer +
bucket-pruned search — the second scale path beside LSH (lsh.py).

FAISS's IVF index (the reference's store is a flat index, but IVF is the
standard next step at its scale) maps onto Spark as:

1. **build**: fit MLlib KMeans (seeded, deterministic) on the corpus;
   assign every vector to its nearest centroid; persist partitioned by
   ``cluster`` (partition pruning = inverted lists).
2. **search**: score the query against the centroid table (tiny,
   broadcast), take the ``nprobe`` nearest clusters, and run exact kNN only
   over those partitions — a partition-pruned scan instead of a full one.

Recall/latency knob: nprobe. With nprobe = k_clusters it degrades to exact.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_fastapi_spark.operators.vector import knn_exact


def build_ivf(
    df: DataFrame,
    k_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Returns (assigned, centroids): corpus with a ``cluster`` column, and
    the centroid table (cluster, centroid ARRAY<DOUBLE>)."""
    with_vec = df.withColumn("features", array_to_vector(F.col(vec_col)))
    model = KMeans(k=k_clusters, seed=seed, featuresCol="features").fit(with_vec)
    assigned = model.transform(with_vec).withColumnRenamed(
        "prediction", "cluster"
    ).drop("features")
    centroids = (
        df.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            ["cluster", "centroid"],
        )
    )
    return assigned, centroids


def write_ivf_index(
    assigned: DataFrame, centroids: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Persist the IVF index as parquet partitioned by ``cluster`` — the
    on-disk twin of FAISS inverted lists. A search probing ``nprobe``
    clusters then PRUNES THE SCAN to those partitions (verified via
    ``PartitionFilters`` in the test): the index read shrinks by
    ``nprobe/k_clusters`` before a single row moves."""
    assigned.write.partitionBy("cluster").mode(mode).parquet(f"{path}/lists")
    centroids.write.mode(mode).parquet(f"{path}/centroids")


def ivf_search_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    corpus_id: str = "vec_id",
) -> DataFrame:
    """Search a persisted IVF index with partition pruning: pick the
    nprobe nearest centroids per query (tiny table, driver-collected),
    then scan ONLY those cluster partitions. The isin() filter on the
    partition column reaches the file index as a PartitionFilter — pruned
    before any IO."""
    from backend_fastapi_spark.operators.vector import knn_exact

    centroids = spark.read.parquet(f"{path}/centroids")
    probe = knn_exact(
        centroids.withColumnRenamed("centroid", "embedding"),
        queries,
        k=nprobe,
        corpus_id="cluster",
        metric="l2",
        exclude_self=False,
    ).select("q_id", "cluster")
    probed = [int(r["cluster"]) for r in probe.select("cluster").distinct().collect()]
    lists = spark.read.parquet(f"{path}/lists").filter(
        F.col("cluster").isin(probed)
    )
    return ivf_search_over(lists, probe, queries, k=k, corpus_id=corpus_id)


def ivf_search_over(
    pruned_lists: DataFrame,
    probe: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
) -> DataFrame:
    """Score pre-pruned inverted lists against their probing queries."""
    from pyspark.sql import Window
    from backend_fastapi_spark.operators.vector import fixed_dot

    pruned = pruned_lists.join(F.broadcast(probe.join(queries, "q_id")), "cluster")
    scored = pruned.withColumn(
        "score_i64", fixed_dot(F.col("embedding"), F.col("q_embedding"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score_i64").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", corpus_id, "cluster", "score_i64")
    )


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    corpus_id: str = "vec_id",
) -> DataFrame:
    """Bucket-pruned exact search: per query, pick nprobe nearest centroids
    (broadcast, tiny), then score only vectors in the probed clusters."""
    from pyspark.sql import Window
    from backend_fastapi_spark.operators.vector import fixed_dot

    probe = knn_exact(
        centroids.withColumnRenamed("centroid", "embedding"),
        queries,
        k=nprobe,
        corpus_id="cluster",
        metric="l2",
        exclude_self=False,
    ).select("q_id", "cluster")
    # (cluster, q_id) pairs broadcast against the corpus: only probed
    # clusters survive the join, each tagged with the probing query
    pruned = assigned.join(
        F.broadcast(probe.join(queries, "q_id")), "cluster"
    )
    scored = pruned.withColumn(
        "score_i64", fixed_dot(F.col("embedding"), F.col("q_embedding"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score_i64").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", corpus_id, "cluster", "score_i64")
    )
