"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
