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
    """Overwrite-mode guard: refuse to write onto (or inside/around) any
    directory the lazily-evaluated ``df`` still reads from —
    ``write_orc(read_orc(spark, p), p)`` would delete the source before
    the scan materializes (the same hazard class maintenance.compact
    guards; here the input paths come from df.inputFiles())."""
    if mode == "overwrite":
        from backend_fastapi_spark.operators.maintenance import _local_path

        import os

        dst = _local_path(path)
        for f in df.inputFiles():
            # compare against the input file's DIRECTORY: writing inside
            # the source dir (dst nested under it) plants foreign files
            # next to the data still being read, not just the
            # exact-overwrite case
            src_dir = os.path.dirname(_local_path(f))
            if (
                src_dir == dst
                or src_dir.startswith(dst + "/")
                or dst.startswith(src_dir + "/")
            ):
                raise ValueError(
                    f"write_orc: overwrite target {path!r} overlaps input "
                    f"file {f!r} — write to a disjoint path, then swap"
                )
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
