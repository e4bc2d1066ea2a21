"""As-of join — a custom operator Spark lacks as a builtin (SURVEY §2.3
notes range/as-of joins as "free via Spark if needed"; this is the
composition that makes it free).

Semantics: for each left row (key, t_left), attach the most recent right
row (key, t_right ≤ t_left). The naive form is an inequality join
(quadratic per key); the scalable form used here is the classic
union-and-carry:

1. union both sides into one (key, t, side, payload) relation
2. sort within key by (t, side) — right rows first on ties so ``≤`` holds
3. carry the last right payload forward with an IGNORE-NULLS last() window
4. keep left rows; their carried payload IS the as-of match

Cost: ONE shuffle on the key (the window's partitionBy) over |L|+|R| rows —
no join explosion, no per-key quadratic work; skew bounded by the largest
single key like any keyed window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tie_col: str | None = None,
    direction: str = "backward",
    strict: bool = False,
) -> DataFrame:
    """Returns ``left`` columns + ``asof_<payload>`` columns from the
    matched right row (inner semantics: unmatched left rows are dropped).

    ``direction='backward'`` (default): most recent right row with
    t_right ≤ t_left (< when ``strict``). ``direction='forward'``: the
    nearest future right row with t_right ≥ t_left (> when ``strict``) —
    the same union-and-carry scan run in reverse time order, still ONE
    keyed-window shuffle.

    ``tie_col`` (a right-side column) breaks equal-timestamp ties
    deterministically (highest wins in both directions).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    # SQL join semantics: NULL keys never match (equality is never TRUE)
    # and a NULL-time right row satisfies no time bound — but unfiltered
    # they would sort NULLS FIRST into the scan and be carried as
    # phantom matches (and NULL-key lefts would meet NULL-key rights in
    # the window's NULL partition). Drop them up front on both sides;
    # left rows keep inner-join semantics (unmatched → dropped anyway).
    left = left.filter(F.col(key).isNotNull() & F.col(left_time).isNotNull())
    right = right.filter(
        F.col(key).isNotNull() & F.col(right_time).isNotNull()
    )
    payload = F.struct(
        F.col(right_time).alias("_t"), *[F.col(c) for c in payload_cols]
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),  # right first on time ties → `<=` semantics
        (F.col(tie_col) if tie_col else F.lit(0)).cast("long").alias("_tie"),
        payload.alias("_payload"),
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).cast(r.schema["_t"].dataType).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(2**62).alias("_tie"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
    )
    r = r.withColumn("_left", F.lit(None).cast(l.schema["_left"].dataType))

    unioned = r.unionByName(l)
    # Scan order: time forward (backward asof) or reversed (forward asof).
    # On equal timestamps, right rows scan BEFORE the left row for the
    # inclusive bound (so they are carried into it) and AFTER it when
    # ``strict`` (so they are not).
    t_ord = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    side_ord = F.col("_side").desc() if strict else F.col("_side").asc()
    w = (
        Window.partitionBy("_k")
        .orderBy(t_ord, side_ord, F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter((F.col("_side") == 1) & F.col("_asof").isNotNull())
    cols = [F.col(f"_left.{c}").alias(c) for c in left.columns]
    cols += [F.col("_asof._t").alias(f"asof_{right_time}")]
    cols += [F.col(f"_asof.{c}").alias(f"asof_{c}") for c in payload_cols]
    return out.select(*cols)
