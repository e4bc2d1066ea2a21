"""Banded interval (range) join — the scale-safe form of a time-window
inequality join.

Spark turns a bare inequality join (``b.ts BETWEEN a.ts AND a.ts + gap``)
into BroadcastNestedLoopJoin or a cartesian product: O(n·m) comparisons,
a scale-killer the plan-audit gate rejects. The banded form buckets both
sides into gap-width time bins and equi-joins on the bin key:

- right rows land in exactly ONE bin;
- left rows fan out to the two bins its window can overlap
  (``bin(l.ts)`` and ``bin(l.ts)+1`` for a forward window of one gap);
- the exact inequality filters the equi-join's output.

Every qualifying pair meets in exactly one bin (the right row's), so no
dedup is needed. Cost: one shuffle on the bin key with ≤2× fan-out of the
left side — linear in input + output, never quadratic. Skewed bins (event
bursts) are ordinary hot keys: AQE skew-split or salting applies as with
any equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    gap_us: int,
    keys: list[str] | None = None,
    extra_filter: Column | None = None,
) -> DataFrame:
    """Pairs (l, r) with ``r.ts`` in ``(l.ts, l.ts + gap_us]`` (microsecond
    precision). Columns of both inputs survive; disambiguate names before
    calling. ``keys``: extra equi-join columns (present on both sides) —
    the join key becomes (keys..., bin), sharpening the shuffle and
    shrinking buckets. ``extra_filter`` is applied after the interval
    predicate."""
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    # integer division (exact) — double division + floor could misbin a
    # quotient within half an ulp of an integer at extreme gaps
    l_bin = F.expr(f"unix_micros({left_ts}) div {int(gap_us)}")
    r_bin = F.expr(f"unix_micros({right_ts}) div {int(gap_us)}")

    lhs = left.withColumn("_bin", F.explode(F.array(l_bin, l_bin + 1)))
    rhs = right.withColumn("_bin", r_bin)
    joined = lhs.join(rhs, [*(keys or []), "_bin"]).drop("_bin")
    cond = (r_us > l_us) & (r_us <= l_us + gap_us)
    if extra_filter is not None:
        cond = cond & extra_filter
    return joined.filter(cond)
