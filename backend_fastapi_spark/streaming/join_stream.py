"""Stream-stream interval join — watermarked, bounded-state.

The batch engine answers "which click led to this purchase?" with the
as-of / banded-interval joins (operators/asof.py, operators/rangejoin.py);
on unbounded streams the same question needs Structured Streaming's
stream-stream join: both sides watermarked, the join condition carrying
an event-time interval so Spark can derive a state watermark and EVICT
buffered rows once no future match is possible. Without the interval
bound a stream-stream join buffers both streams forever — the
out-of-memory shape this module exists to avoid.

Scale posture: state per key is O(rows inside watermark + interval), not
O(stream); the join itself shuffles both sides on the equi-key exactly
once (same hash partitioning as the batch equi-join). The watermark
delays results by at most the lateness bound — the correctness/latency
trade every streaming attribution pipeline prices explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    max_gap: str = "30 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING DataFrames on ``key`` where the right event
    lands within (left_ts, left_ts + max_gap] — strictly after the left
    row, attribution-style (click -> purchase). Column names must be
    disjoint apart from ``key``; both ts columns survive in the output.

    Both inputs get the same watermark; the interval predicate uses
    ``expr`` with INTERVAL arithmetic so Catalyst registers the time
    bound and plans bounded state eviction (visible in the plan as the
    two-sided state watermark). ``how`` may be "inner" or the outer
    variants Structured Streaming allows for interval joins
    ("leftOuter"/"rightOuter"/"fullOuter" — outer rows emit only after
    the watermark proves no match can arrive).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = F.expr(
        f"{key} = _r_{key} AND {right_ts} > {left_ts} "
        f"AND {right_ts} <= {left_ts} + INTERVAL {max_gap}"
    )
    rw = rw.withColumnRenamed(key, f"_r_{key}")
    out = lw.join(rw, cond, how)
    # Outer rows carry their key only on their own side: a
    # rightOuter/fullOuter unmatched right row has NULL in the left
    # ``key`` column and its real key in the renamed right copy —
    # coalesce before dropping it, or the caller gets outer rows whose
    # join key is unrecoverably NULL.
    return out.withColumn(
        key, F.coalesce(F.col(key), F.col(f"_r_{key}"))
    ).drop(f"_r_{key}")
