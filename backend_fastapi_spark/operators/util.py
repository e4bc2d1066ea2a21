"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, id_col: str | None = None) -> DataFrame:
    """Spread a compute-heavy scan across the cluster when the source is a
    handful of small files.

    A single small parquet file (often one row group, so byte-range
    splitting cannot divide it) scans as ONE partition, serializing any
    per-row-expensive downstream work (vector scoring, per-shingle
    hashing) onto one core. If the plan's initial partition count is
    already ≥ the session's default parallelism — always true for a real
    multi-file 100 TB table — this is a NO-OP: no shuffle is added at
    scale. Otherwise repartition (hash on ``id_col`` when given, so
    later ``groupBy(id_col)`` reuses the partitioning; round-robin
    otherwise).
    """
    from pyspark.sql import functions as F

    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    # Explicit width (not spark.sql.shuffle.partitions): the guard only
    # fires on small inputs, where a 200-way fan-out would just be task
    # overhead.
    if id_col:
        return df.repartition(target, F.col(id_col))
    return df.repartition(target)


def bounded_collect(df: DataFrame, bound: int) -> list:
    """Collect at most ``bound`` + 1 rows as ONE job. A bare
    ``limit(n).collect()`` runs executeTake's incremental partition ramp
    (1, 4, 16, ... partitions — several driver round-trips for any
    driver-small frame that never reaches its limit); ``coalesce(1)``
    chains the input partitions into a single lazily-consumed task, so
    the collect both stops reading at the bound and costs exactly one
    job. Callers check ``len(rows) > bound`` to detect an over-bound
    input. Use only where the collected side is driver-small by
    contract — the single task reads sequentially."""
    return df.coalesce(1).limit(bound + 1).collect()


def materialize(df: DataFrame) -> DataFrame:
    """Cut lineage and materialize a small intermediate that multiple plan
    branches will re-read (e.g. MinHash/SimHash signatures read by every
    band join).

    Cluster-safe: when a reliable checkpoint directory is configured
    (``sc.setCheckpointDir`` — always set it on a real cluster), uses
    ``checkpoint(eager=True)`` so executor loss cannot destroy the copy.
    Falls back to ``localCheckpoint`` (executor-local blocks) otherwise —
    fine on local[*] test runs, NOT durable on a multi-node cluster.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
