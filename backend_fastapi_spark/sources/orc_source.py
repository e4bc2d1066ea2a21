"""ORC source/sink — the second columnar format beside parquet.

Spark ships a native vectorized ORC reader/writer; exposing it means a
user whose lake is ORC (the common Hive-era layout) runs the same
queries with only the source swapped. Round-trips preserve schema and
values exactly for every type the engine's tables use (including the
binary and array<float> columns); the test asserts hash-identical
content vs the parquet-sourced DataFrame.

Scale posture: identical to parquet — splittable stripes, predicate
pushdown + column pruning reach the scan (PushedFilters/ReadSchema in
the plan), partition-directory layout and AQE behave the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
