"""Hard gate: no registered query may carry a scale-killer plan shape.

VERDICT r1 "what's wrong" #3 named unpartitioned-window footguns; this
test walks every registered query's optimized + physical plan and fails
on (a) a global Window over raw (non-aggregated) rows — an all-rows
single-task funnel — and (b) a cartesian pair blowup that is not the
1-row scalar-aggregate augment idiom. See tests/plan_audit.py for the
exact rules and EXPLAIN_AUDIT.md for the committed audit.
"""

from __future__ import annotations

from backend_fastapi_spark import queries as Q
from tests.conftest import SF_SMOKE
from tests.plan_audit import audit_plan


def test_no_scale_killer_plan_shapes(spark):
    bad = {}
    for name, spec in Q.REGISTRY.items():
        flags = audit_plan(spec.fn(spark, SF_SMOKE))
        if flags:
            bad[name] = flags
    assert not bad, f"scale-killer plan shapes: {bad}"


# ---- negative fixtures: the gate itself must keep catching the shapes it
# exists for (VERDICT r2 directive #10). If a Spark upgrade or audit edit
# ever lets one of these through, the gate is dead weight — fail loudly.


def test_gate_flags_global_window_over_raw_rows(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    # the canonical footgun: rank every raw row through one task
    flagged = orders.withColumn(
        "rn", F.row_number().over(Window.orderBy("o_orderkey"))
    )
    flags = audit_plan(flagged)
    assert "global_window" in flags, f"gate missed raw-row global window: {flags}"


def test_gate_allows_global_window_after_grouped_aggregate(spark):
    """Two-level prefix-scan idiom (bounded post-agg row set) must NOT flag —
    this is the allowed counterpart the gate's aggregate check exists for."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count("*").alias("n")
    )
    scanned = daily.withColumn(
        "cum", F.sum("n").over(Window.orderBy("d"))
    )
    assert "global_window" not in audit_plan(scanned)


def test_gate_flags_non_scalar_nested_loop_join(spark):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    # inequality-only join condition → BroadcastNestedLoopJoin(Inner) with a
    # non-scalar (multi-row) broadcast side: O(n·m) pair blowup
    blowup = orders.join(
        F.broadcast(cust.select("c_custkey", "c_acctbal")),
        orders["o_totalprice"] > cust["c_acctbal"],
    )
    flags = audit_plan(blowup)
    assert "cartesian" in flags, f"gate missed non-scalar BNLJ: {flags}"


def test_gate_allows_scalar_aggregate_augment(spark):
    """The 1-row scalar-aggregate augment (cross-join a groupBy-less agg
    back onto the table) is the allowed idiom — must not flag."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    total = orders.agg(F.sum("o_totalprice").alias("grand_total"))
    augmented = orders.crossJoin(F.broadcast(total))
    assert "cartesian" not in audit_plan(augmented)
