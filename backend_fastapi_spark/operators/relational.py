"""Relational operator library — SURVEY §2.2-2.7 re-expressed Spark-first.

The reference's relational surface is SQL strings against MariaDB plus
app-side joins (``src/services/db_llm_service.py:47-233``,
``src/tools/tool_executor.py``). Here every operator is a composable
DataFrame→DataFrame function; Catalyst handles pushdown/pruning/join
selection, AQE handles skew. Dimension tables are broadcast explicitly
where the reference does per-key point lookups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Top-k / ordered retrieval (SURVEY §2.6 O1-O7)
# ---------------------------------------------------------------------------

def top_n_recent(
    df: DataFrame,
    order_col: str,
    n: int,
    desc: bool = True,
    tie_cols: list[Column] | None = None,
) -> DataFrame:
    """O1: ORDER BY c DESC LIMIT n (reference db_llm_service.py:144-148).

    Spark compiles this to TakeOrderedAndProject — no global sort, each
    partition keeps n rows then the driver merges. Scales to any input
    size. ``tie_cols`` totalizes the order: this orderBy REPLACES any
    sort on ``df`` (Catalyst eliminates adjacent sorts), so a caller's
    pre-sort cannot break ties — rows tying on ``order_col`` at the
    limit boundary would otherwise survive partition-order-dependently.
    """
    key = F.col(order_col).desc() if desc else F.col(order_col).asc()
    return df.orderBy(key, *(tie_cols or [])).limit(n)


def per_group_top_n(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], n: int
) -> DataFrame:
    """W1: per-group cap via row_number (reference internal_db_service.py:350-364).

    One shuffle on the group keys; rank evaluated map-side after the
    exchange — the idiomatic scalable form of "≤ cap rows per title".
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def diversify_round_robin(
    df: DataFrame,
    group_col: str,
    score_col: str,
    per_group_cap: int,
    top_k: int,
    tie_col: str,
) -> DataFrame:
    """W2: round-robin diversification (enhanced_internal_db_service.py:765-794).

    Reference semantics: bucket hits by ``group_col``, sort each bucket by
    score desc, emit rank-0 of every bucket, then rank-1, ... until top_k.
    Spark form: rank within group, then global order by (rank, score desc).
    Two window passes + one TakeOrdered — no driver-side loop.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(tie_col).asc()
    )
    return (
        df.withColumn("_grp_rank", F.row_number().over(w))
        .filter(F.col("_grp_rank") <= per_group_cap)
        .orderBy(F.col("_grp_rank").asc(), F.col(score_col).desc(), F.col(tie_col).asc())
        .limit(top_k)
        .drop("_grp_rank")
    )


def topk_margin(
    df: DataFrame,
    score_col: str,
    k: int,
    margin: float,
    floor: float,
    tie_col: str,
    partition_col: str | None = None,
) -> DataFrame:
    """P7+P8+O5: similarity floor + relative margin cut + top-k
    (enhanced_internal_db_service.py:689-727).

    keep score >= max(best - margin, best * (1 - margin)) and score >= floor.

    ``partition_col`` scopes every window (and the final top-k) per key —
    the form for batched queries. With None there is NO window at all: the
    global best comes from a 1-row aggregate broadcast back over the rows
    (map-side, any partition count), and the top-k is orderBy+limit, which
    Spark executes as TakeOrderedAndProject (per-partition partial top-k,
    then a k-row merge) — both shapes scale-safe at any input size.
    """
    floored = df.filter(F.col(score_col) >= F.lit(floor))
    if partition_col is None:
        best_df = floored.agg(F.max(score_col).alias("_best"))
        cut = F.greatest(
            F.col("_best") - F.lit(margin), F.col("_best") * (1.0 - F.lit(margin))
        )
        return (
            floored.join(F.broadcast(best_df))
            .filter(F.col(score_col) >= cut)
            .drop("_best")
            .orderBy(F.col(score_col).desc(), F.col(tie_col).asc())
            .limit(k)
        )
    base = Window.partitionBy(partition_col)
    best = F.max(score_col).over(base)
    cut = F.greatest(best - F.lit(margin), best * (1.0 - F.lit(margin)))
    out = (
        floored.withColumn("_cut", cut)
        .filter(F.col(score_col) >= F.col("_cut"))
        .drop("_cut")
    )
    w_rank = base.orderBy(F.col(score_col).desc(), F.col(tie_col).asc())
    return (
        out.withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """J6 existence check → left_semi (no row duplication, early-out probe)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """J6 delete-nonexistent → left_anti."""
    return left.join(right, on, "left_anti")


def star_join(
    fact: DataFrame, dims: list[tuple[DataFrame, list[str]]], broadcast_dims: bool = True
) -> DataFrame:
    """J3: fact table joined to small dimensions; dims broadcast so the fact
    side never shuffles (reference does these as separate point queries)."""
    out = fact
    for dim, keys in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, keys, "inner")
    return out


# ---------------------------------------------------------------------------
# Context assembly (SURVEY §2.4 A9, §2.8 packing)
# ---------------------------------------------------------------------------

def string_agg_context(
    df: DataFrame,
    group_cols: list[str],
    line_col: Column,
    order_col: Column,
    sep: str = "\n",
) -> DataFrame:
    """A9: per-group ordered string aggregation (db_llm_service.py:110-233).

    Deterministic ordering via sort over collected (order, line) structs —
    array_sort on structs keeps the whole thing JVM-side (no UDF).
    """
    pair = F.struct(order_col.alias("o"), line_col.alias("l"))
    return df.groupBy(*group_cols).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["l"]), sep
        ).alias("context")
    )
