"""Parquet source with schema normalization.

The driver's ``events`` table is written with Parquet TIMESTAMP(NANOS),
which Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL). We read
nanos as INT64 (``spark.sql.legacy.parquet.nanosAsLong``) and convert to
a microsecond timestamp — lossless for this data and what the DuckDB
oracle sees too (DuckDB TIMESTAMP is microseconds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tables known to carry nanosecond timestamps, with the columns to fix.
_NANOS_TS_COLS = {"events": ["ts"]}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan ``{sf_dir}/{name}.parquet``, normalizing nanosecond timestamps.

    Pins the session timezone to UTC: parquet timestamps are instants, and
    every downstream date/day computation (and the DuckDB oracle, which is
    UTC-naive) assumes UTC wall-clock semantics regardless of the caller's
    session default.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Engine tuning for sessions still on Spark's out-of-the-box shuffle
    # width: 200 reducers over a laptop-scale input is pure task-scheduling
    # overhead. Only the untouched default is overridden — an explicitly
    # configured width (our factory's, or a cluster deployment's) is kept.
    # AQE (on by default in Spark 3.2+) re-coalesces at real scale either
    # way.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(spark.sparkContext.defaultParallelism),
        )
    if name in _NANOS_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for c in _NANOS_TS_COLS[name]:
            dt = df.schema[c].dataType
            if isinstance(dt, T.LongType):
                # integer division: double division loses precision at ns scale
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
            elif isinstance(dt, T.TimestampNTZType):
                # Newer testdata writes TIMESTAMP(MICROS, isAdjustedToUTC=false),
                # which Spark reads as TIMESTAMP_NTZ. The session tz is pinned
                # UTC above, so a plain cast reinterprets the naive wall-clock
                # as the identical UTC instant — same values the UTC-naive
                # DuckDB oracle sees, and downstream instant functions
                # (unix_micros, window, to_utc_timestamp) work unchanged.
                df = df.withColumn(c, F.col(c).cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def footer_row_count(sf_dir: str, name: str) -> int | None:
    """Total row count of ``{sf_dir}/{name}.parquet`` from the parquet
    footer — a driver-side metadata peek, NO Spark job. Used for cheap
    plan-shape decisions (e.g. whether a per-block matmul needs its chunk
    decomposition) that would otherwise cost a count() stage at every
    scale. Returns None when the path is not a plain local file/dir of
    parquet parts (remote FS, glob sources) — callers must treat None as
    "unknown, take the scale path".
    """
    import os

    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked in
        return None
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            entries = os.listdir(path)
            if any(os.path.isdir(os.path.join(path, e)) for e in entries):
                # ANY subdirectory (hive-partitioned / nested / mixed
                # layout) means top-level parts alone would UNDERCOUNT:
                # None here means "didn't look", not "empty" — honoring
                # the None contract keeps callers on the scale path
                # instead of mistaking a 100 TB table for tiny
                # (ADVICE r09: a mixed layout previously counted only the
                # top-level files).
                return None
            parts = [f for f in entries if f.endswith(".parquet")]
            if not parts:
                return None
            return sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in parts
            )
        return pq.ParquetFile(path).metadata.num_rows
    except (OSError, ValueError):
        return None
