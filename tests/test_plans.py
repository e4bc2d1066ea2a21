"""Plan-shape regression tests: the physical plans that make these queries
scale must keep their shape (pushdown, broadcast, partial agg, no
single-partition windows in kNN)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from backend_fastapi_spark import queries as Q
from backend_fastapi_spark.operators.crud import delete_keys, upsert
from tests.conftest import SF_ORACLE


def _plan(spark, name: str) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        Q.REGISTRY[name].fn(spark, SF_ORACLE).explain("formatted")
    return buf.getvalue()


def test_filter_and_projection_pushdown(spark):
    plan = _plan(spark, "filtered_projection")
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice" in plan
    # column pruning: l_comment-style unused columns never read
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint" in plan


def test_star_join_broadcasts_dims(spark):
    plan = _plan(spark, "region_revenue")
    # formatted mode prints each node in tree + detail: 3 joins → 6 mentions
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "SortMergeJoin" not in plan


def test_pricing_summary_partial_agg(spark):
    plan = _plan(spark, "pricing_summary")
    # partial (map-side) aggregate must appear before the exchange
    assert "partial_sum" in plan or "HashAggregate" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_knn_no_scored_crossjoin_shuffle(spark):
    """kNN scoring must never materialize/shuffle the |corpus|×|Q| scored
    set: the per-batch matmul top-k emits only candidate rows (MapInPandas
    node), there is no cartesian of corpus×queries, and the payload
    restore joins are broadcast."""
    plan = _plan(spark, "knn_batch_top5")
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # k·|Q| candidate set joined back


def test_topn_uses_take_ordered(spark):
    plan = _plan(spark, "top_orders_recent")
    assert "TakeOrderedAndProject" in plan


def test_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], ["k", "v", "ver"]
    )
    updates = spark.createDataFrame(
        [(2, "b2", 11), (3, "c_stale", 9), (4, "d", 10)], ["k", "v", "ver"]
    )
    got = {r.k: (r.v, r.ver) for r in upsert(base, updates, ["k"], "ver").collect()}
    assert got == {
        1: ("a", 10),       # untouched
        2: ("b2", 11),      # newer version wins
        3: ("c", 10),       # stale update loses
        4: ("d", 10),       # insert
    }
    # equal version → update side wins (src tie-break)
    up2 = spark.createDataFrame([(1, "a_new", 10)], ["k", "v", "ver"])
    got2 = {r.k: r.v for r in upsert(base, up2, ["k"], "ver").collect()}
    assert got2[1] == "a_new"


def test_delete_keys_ownership(spark):
    base = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["k", "v"])
    keys = spark.createDataFrame([(2,), (99,)], ["k"])  # 99 doesn't exist
    got = sorted(r.k for r in delete_keys(base, keys, ["k"]).collect())
    assert got == [1, 3]


def test_scd2_multi_generation_history(spark):
    """Two successive SCD2 merges build a 3-version history chain with
    correct validity intervals and exactly one open row per key."""
    import pandas as pd

    from backend_fastapi_spark.operators.crud import scd2_apply

    t0, t1, t2 = (pd.Timestamp(f"2024-0{m}-01") for m in (1, 3, 6))
    current = spark.createDataFrame(
        pd.DataFrame({
            "k": [1, 2],
            "attr": ["a", "x"],
            "valid_from": [t0, t0],
            "valid_to": [pd.NaT, pd.NaT],
            "is_current": [True, True],
        })
    )
    u1 = spark.createDataFrame(
        pd.DataFrame({"k": [1], "attr": ["b"], "ts": [t1]})
    )
    gen1 = scd2_apply(current, u1, ["k"], "ts", ["attr"])
    u2 = spark.createDataFrame(
        pd.DataFrame({"k": [1, 3], "attr": ["c", "new"], "ts": [t2, t2]})
    )
    gen2 = scd2_apply(gen1, u2, ["k"], "ts", ["attr"])
    rows = sorted(
        ((r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
         for r in gen2.collect()),
        key=lambda x: (x[0], x[2]),
    )
    assert rows == [
        (1, "a", t0, t1, False),
        (1, "b", t1, t2, False),
        (1, "c", t2, None, True),
        (2, "x", t0, None, True),
        (3, "new", t2, None, True),
    ]
    # exactly one open row per key
    opens = [r for r in rows if r[4]]
    assert len(opens) == 3 and len({r[0] for r in opens}) == 3


def test_delete_where_keeps_null_predicate_rows(spark):
    """SQL DELETE removes rows where the predicate is TRUE; rows where
    it evaluates NULL must be KEPT (filter(~cond) would drop them)."""
    from backend_fastapi_spark.operators.crud import delete_where

    df = spark.createDataFrame(
        [(1, "dead"), (2, "live"), (3, None)], ["id", "status"]
    )
    kept = {r.id for r in delete_where(df, F.col("status") == "dead").collect()}
    assert kept == {2, 3}


def test_upsert_tie_is_deterministic_and_markers_guarded(spark):
    """Two update rows sharing key AND version: the survivor must be the
    same on every run (whole-row-hash tie-break), and reserved marker
    columns are rejected."""
    import pytest

    from backend_fastapi_spark.operators.crud import upsert

    base = spark.createDataFrame([(1, 0, "base")], ["k", "v", "payload"])
    ups = spark.createDataFrame(
        [(1, 5, "left"), (1, 5, "right")], ["k", "v", "payload"]
    )
    winners = {
        upsert(base, ups, ["k"], "v").collect()[0].payload for _ in range(3)
    }
    assert len(winners) == 1  # same survivor every run
    with pytest.raises(ValueError, match="_crud_src"):
        upsert(base.withColumn("_crud_src", F.lit(9)), ups, ["k"], "v")


def test_scd2_open_row_with_null_valid_from_survives(spark):
    """An open row whose valid_from is NULL (unknown start) must pass
    through untouched when no update arrives — join-match detection is
    by side markers, not by payload-column nullability."""
    import datetime

    from backend_fastapi_spark.operators.crud import scd2_apply

    t = datetime.datetime(2024, 6, 1)
    current = spark.createDataFrame(
        [(1, "x", None, None, True)],
        "k long, attr string, valid_from timestamp, valid_to timestamp,"
        " is_current boolean",
    )
    updates = spark.createDataFrame(
        [(2, "y", t)], "k long, attr string, ts timestamp"
    )
    rows = {(r.k, r.attr, r.is_current)
            for r in scd2_apply(current, updates, ["k"], "ts", ["attr"]).collect()}
    assert rows == {(1, "x", True), (2, "y", True)}
