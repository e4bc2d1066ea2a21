"""Batch CRUD operators — SURVEY §2.1 S15 re-expressed for columnar storage.

The reference mutates single rows in MariaDB (INSERT/UPDATE/DELETE per
request, ``tool_executor.py:239-285,471-554``). A columnar engine applies
the same semantics as *batch merges*: upsert = union + keep-newest-per-key,
delete = anti-join. These compose with partitioned parquet sinks (rewrite
the affected partitions) — the Spark-native CDC shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Union + keep the highest-version row per key (updates win ties via
    the source marker; residual ties — two update rows sharing key AND
    version — break on a deterministic whole-row hash so the survivor is
    bit-reproducible across runs/plans, the same total-order discipline
    as every oracle-checked operator). One shuffle on the key."""
    for marker in ("_crud_src", "_crud_rn"):
        if marker in base.columns or marker in updates.columns:
            raise ValueError(f"upsert: reserved column name {marker!r} in input")
    tagged_base = base.withColumn("_crud_src", F.lit(0))
    tagged_updates = updates.withColumn("_crud_src", F.lit(1))
    unioned = tagged_base.unionByName(tagged_updates)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(),
        F.col("_crud_src").desc(),
        F.xxhash64(*[F.col(c) for c in base.columns]).asc(),
    )
    return (
        unioned.withColumn("_crud_rn", F.row_number().over(w))
        .filter(F.col("_crud_rn") == 1)
        .drop("_crud_rn", "_crud_src")
    )


def delete_where(base: DataFrame, cond: Column) -> DataFrame:
    """Predicate delete. SQL DELETE semantics: remove rows where the
    predicate is TRUE — rows where it evaluates NULL are KEPT (a plain
    ``filter(~cond)`` would silently delete them, since ~NULL is NULL)."""
    return base.filter(~cond.eqNullSafe(F.lit(True)))


def delete_keys(base: DataFrame, keys: DataFrame, key_cols: list[str]) -> DataFrame:
    """Key-set delete with ownership semantics = left_anti join
    (tool_executor.py:526-543 existence-check-then-delete)."""
    return base.join(keys, key_cols, "left_anti")


def salted_sum(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column,
    alias: str,
    n_salt: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Skew-safe aggregation: pre-aggregate on (group, salt) — spreading a
    hot key over ``n_salt`` reducers — then combine. Result identical to a
    plain groupBy-sum; the two-stage shape is the point (SURVEY §7 step 8
    salting recipe; AQE handles join skew, this handles agg skew).

    Note: Spark's partial aggregation already combines map-side; explicit
    salting matters when per-key cardinality within partitions is low but
    one reduce key is huge (e.g. groupBy on a power-law user_id with
    high-cardinality payloads like collect_list).
    """
    # The salt feeds a shuffle key, so it must be DETERMINISTIC per row:
    # monotonically_increasing_id depends on partition layout, and a
    # map-task retry after partial reducer fetches would re-salt rows
    # onto different reducers (lost/double-counted partials). Default to
    # a whole-row hash — stable for a given row regardless of placement.
    # Limitation: fully IDENTICAL duplicate rows (a common shape of the
    # hot-key skew this targets) all hash to ONE salt value, collapsing
    # the mitigation back onto a single reducer; correctness is
    # unaffected, but pass salt_source (a value column that varies within
    # the hot key) when duplicate rows dominate a key.
    salt = F.pmod(
        F.xxhash64(
            F.col(salt_source)
            if salt_source
            else F.xxhash64(*[F.col(c) for c in df.columns])
        ),
        F.lit(n_salt),
    )
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return stage1.groupBy(*group_cols).agg(F.sum("_partial").alias(alias))


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tracked_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge: history-preserving upsert.

    ``current`` rows carry (key, tracked attrs, valid_from, valid_to,
    is_current) — valid_to NULL on open rows. ``updates`` carry
    (key, tracked attrs, ts_col). For each update whose tracked attrs
    DIFFER from the key's open row (or whose key is new): close the open
    row (valid_to = update ts, is_current = false) and open a new row
    (valid_from = update ts, valid_to = NULL). No-change updates are
    dropped (the standard SCD2 idempotence rule). One update per key per
    call (the batch-merge contract; callers fold multi-update batches by
    applying in ts order or pre-collapsing to the latest).

    Plan shape: one shuffle on the key for the open-row join; closed
    history rows pass through untouched (union, no rewrite) — with a
    key-partitioned sink only affected partitions rewrite, the same CDC
    posture as ``upsert``."""
    open_rows = current.filter(F.col("valid_to").isNull()).withColumn(
        "_c_mark", F.lit(1)
    )
    closed_rows = current.filter(F.col("valid_to").isNotNull())

    upd = updates.select(
        *key_cols,
        *[F.col(c).alias(f"_u_{c}") for c in tracked_cols],
        F.col(ts_col).alias("_u_ts"),
        F.lit(1).alias("_u_mark"),
    )
    joined = open_rows.join(upd, key_cols, "full_outer")

    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~(
            F.col(c).eqNullSafe(F.col(f"_u_{c}"))
        )
    # Join-match detection via explicit side markers — NOT via payload
    # columns like valid_from/ts, which may legitimately be NULL (an
    # open row with unknown start date would otherwise vanish from the
    # merge entirely).
    has_open = F.col("_c_mark").isNotNull()
    has_upd = F.col("_u_mark").isNotNull()

    # open rows untouched (no update, or update equals current attrs)
    untouched = joined.filter(
        has_open & (~has_upd | (has_upd & ~changed))
    ).select(*current.columns)
    # open rows closed by a differing update
    closed_now = (
        joined.filter(has_open & has_upd & changed)
        .select(
            *key_cols,
            *tracked_cols,
            "valid_from",
            F.col("_u_ts").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    # new open rows: differing update on an existing key, or a new key
    opened = (
        joined.filter(has_upd & (~has_open | changed))
        .select(
            *key_cols,
            *[F.col(f"_u_{c}").alias(c) for c in tracked_cols],
            F.col("_u_ts").alias("valid_from"),
            # match current's valid_to type exactly (timestamp vs
            # timestamp_ntz matters to unionByName)
            F.lit(None).cast(current.schema["valid_to"].dataType)
            .alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return (
        closed_rows.unionByName(untouched)
        .unionByName(closed_now)
        .unionByName(opened)
    )
