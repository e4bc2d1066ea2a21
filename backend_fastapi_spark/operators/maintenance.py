"""Lake maintenance: small-file compaction + sort-on-write clustering.

The reference's index lifecycle (create/bootstrap/upsert sinks,
src/services/vector_db_service.py) stops at "write the rows". At 100 TB
a sink that only appends degrades in two independent ways this module
addresses, both standard lakehouse practice expressed with public Spark
APIs only:

- **Small files.** Streaming/batch upserts leave thousands of KB-sized
  parquet files; each costs a scan task + a namenode/S3 LIST round trip.
  `compact()` rewrites a table directory at a target in-file byte size
  (one `repartition(n)` — a single round-robin shuffle, no skew by
  construction) and reports before/after file stats.
- **Unclustered layout.** Parquet row-group min/max stats only prune
  scans when values are locally clustered. `cluster_write()` writes
  range-partitioned + sorted-within-partition files
  (`repartitionByRange(n, cols).sortWithinPartitions(cols)`) so every
  selective range predicate touches O(selectivity) row groups instead of
  all of them. `skipping_report()` PROVES the effect from the parquet
  footers themselves (pyarrow): the fraction of row groups whose
  [min, max] envelope intersects a probe predicate — the same statistic
  a Spark scan's row-group filter uses to skip IO.

Scale posture: compact's shuffle moves each byte exactly once and the
output file count is total_bytes/target (128 MB default — the classic
HDFS-block-aligned size); cluster_write's range exchange samples
boundaries so output files are equal-sized even under key skew. Neither
collects data to the driver; the file-stats reports read FileSystem
metadata (one LIST) and parquet footers (O(files), metadata-only IO).
"""

from __future__ import annotations

import math
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # one HDFS block / S3 part

_FILE_SCHEME = re.compile(r"^file:(//[^/]*)?")


def _local_path(path: str) -> str:
    """Resolve a local/file: path to its canonical filesystem form
    (scheme + authority stripped, symlinks resolved)."""
    return os.path.realpath(_FILE_SCHEME.sub("", path))


def _list_parquet_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """[(file_path, bytes)] for a table directory, via the Hadoop
    FileSystem API (works on file://, hdfs://, s3a:// alike) — one LIST,
    metadata only."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = []
    if not fs.exists(p):
        return out
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        if name.endswith(".parquet"):
            out.append((name, int(st.getLen())))
    return sorted(out)


def file_stats(spark: SparkSession, path: str) -> dict:
    """{n_files, total_bytes, max_bytes, min_bytes, avg_bytes} for the
    parquet files under ``path``."""
    files = _list_parquet_files(spark, path)
    sizes = [b for _, b in files]
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "max_bytes": max(sizes, default=0),
        "min_bytes": min(sizes, default=0),
        "avg_bytes": sum(sizes) // len(sizes) if sizes else 0,
    }


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Rewrite the parquet table at ``src`` into ``dst`` with
    ceil(total_bytes / target_bytes) output files. Returns
    {before, after} file stats. Write-then-swap is the caller's
    transaction (at scale: a metastore/table-format pointer flip);
    this operator never mutates ``src``."""
    if target_bytes <= 0:
        raise ValueError(f"compact: target_bytes must be > 0, got {target_bytes}")
    # Overlap guard: overwriting (or writing inside) the directory being
    # lazily read corrupts it. realpath-resolve both ends (catches
    # file://authority spellings and symlink aliases) and reject either
    # nesting direction, not just exact equality. Non-local schemes
    # (hdfs://, s3a://) can't be realpath'd — compare as given.
    a, b = _local_path(src), _local_path(dst)
    if a == b or b.startswith(a + os.sep) or a.startswith(b + os.sep):
        raise ValueError(
            "compact: src and dst must not overlap — overwriting or "
            "nesting inside the directory being read corrupts it; write "
            "to a disjoint path, then swap the table pointer"
        )
    before = file_stats(spark, src)
    if before["n_files"] == 0:
        raise ValueError(f"compact: no parquet files under {src!r}")
    n_out = max(1, math.ceil(before["total_bytes"] / target_bytes))
    df = spark.read.parquet(src)
    df.repartition(n_out).write.mode("overwrite").parquet(dst)
    return {"before": before, "after": file_stats(spark, dst), "n_out": n_out}


def cluster_write(
    df: DataFrame,
    dst: str,
    sort_cols: list[str],
    n_files: int,
) -> None:
    """Write ``df`` range-partitioned on ``sort_cols`` into ``n_files``
    files, sorted within each file — the layout that makes parquet
    row-group min/max stats (and any engine's zone maps) selective for
    range and point predicates on ``sort_cols``."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(dst)
    )


def zorder_key_2d(a, b, bits: int = 16):
    """Morton/Z-order key: interleave the low ``bits`` bits of two
    non-negative int columns (a's bit i lands at 2i+1, b's at 2i).
    Pure bitwise expressions — whole-stage codegen, no UDF — and exactly
    reproducible in any engine (the audit oracle re-derives nothing: it
    reads the footers the layout produces)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(
                F.shiftright(a, i).bitwiseAND(F.lit(1)).cast("long"),
                2 * i + 1,
            )
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i
            )
        )
    return z


def zorder_write(
    df: DataFrame,
    dst: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered on the 2-D Z-ORDER of ``cols`` — the
    multi-column data-skipping layout (Delta's OPTIMIZE ZORDER BY, as a
    plain-parquet operator). ``cluster_write`` on one column makes
    row-group min/max envelopes tight on THAT column and useless on any
    other; interleaving the bits of two rank-normalized columns gives a
    space-filling curve whose contiguous ranges are small RECTANGLES in
    (a, b) space, so footer envelopes stay selective for predicates on
    EITHER column — the layout lever when a 100 TB table serves two
    access paths and bucketing can only pick one.

    Normalization is min/max fixed-point (one tiny agg job at write
    time, the same pass a stats collector already makes): each column
    maps to [0, 2^bits) before interleaving. Two columns by design —
    every added dimension halves the bits available per column and
    dilutes every envelope (the documented Z-order tradeoff), and two
    is the reference workload's real shape (key + attribute)."""
    if len(cols) != 2:
        raise ValueError(
            f"zorder_write clusters exactly 2 columns (got {cols!r}) — "
            "more dims dilute per-column skipping; pick the two hottest "
            "predicates or fall back to cluster_write on one"
        )
    a_col, b_col = cols
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(a_col), F.max(a_col), F.min(b_col), F.max(b_col)
    ).head()
    if lo_a is None or lo_b is None:
        # empty input: nothing to interleave — write the empty layout
        # (same behavior as cluster_write on an empty frame)
        df.repartition(n_files).write.mode("overwrite").parquet(dst)
        return
    top = (1 << bits) - 1

    def norm(c: str, lo, hi):
        span = max(int(hi) - int(lo), 1)
        return F.floor(
            (F.col(c).cast("long") - F.lit(int(lo))) * F.lit(top) / F.lit(span)
        ).cast("long")

    z = zorder_key_2d(norm(a_col, lo_a, hi_a), norm(b_col, lo_b, hi_b), bits)
    (
        df.repartitionByRange(n_files, z)
        .sortWithinPartitions(z)
        .write.mode("overwrite")
        .parquet(dst)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a Spark bucketed table: rows hash-partitioned
    into ``n_buckets`` files per write-task group on ``bucket_cols``
    (and sorted within buckets when ``sort``), with the bucket spec
    recorded in the session catalog. THE co-location tool for repeated
    big-to-big equi-joins at 100 TB: two tables bucketed the same way
    on the join key join with ZERO Exchange on either side — the
    shuffle is paid once at write time, not per query
    (tests/test_maintenance.py::test_bucketed_join_avoids_shuffle asserts the exchange-free plan). Also
    removes the sort for sort-merge joins when ``sort`` matches the
    join key.

    Catalog-backed by necessity (plain parquet paths carry no bucket
    metadata); at cluster scale the same API writes through the shared
    metastore."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be > 0, got {n_buckets}")
    w = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def skipping_report(path: str, col: str, lo, hi) -> dict:
    """Row-group pruning statistics for predicate ``lo <= col <= hi``,
    read from the parquet footers (pyarrow, metadata-only): how many row
    groups a stats-aware scan must read vs the total. Lower
    overlap_fraction = better clustering = less IO at 100 TB.

    Local paths only (pyarrow footers are read through the OS); walks
    the directory recursively so partitioned (key=value subdir) layouts
    are covered, and raises — never reports a vacuous "perfect
    skipping" — when no parquet file is found."""
    import pyarrow.parquet as pq

    local = _local_path(path)
    if "://" in path and not path.startswith("file:"):
        raise ValueError(
            f"skipping_report reads footers via the local OS; got {path!r}"
        )
    files = sorted(
        os.path.join(d, name)
        for d, _, names in os.walk(local)
        for name in names
        if name.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"skipping_report: no parquet files under {path!r}")
    total = 0
    overlapping = 0
    for fpath in files:
        md = pq.ParquetFile(fpath).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        if idx < 0:
            raise ValueError(
                f"skipping_report: column {col!r} not in parquet footers of "
                f"{fpath!r} — note partition columns in a key=value layout "
                "are encoded in directory names and carry no footer stats"
            )
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            total += 1
            if stats is None or not stats.has_min_max:
                overlapping += 1  # no stats -> engine must read it
            elif not (stats.max < lo or stats.min > hi):
                overlapping += 1
    return {
        "row_groups": total,
        "overlapping": overlapping,
        "overlap_fraction": overlapping / total if total else 0.0,
    }
