"""Flagship plan: the user-context star query (SURVEY §3.1/§7.2, J2).

Reference behavior (``src/services/db_llm_service.py:47-233``): for one user,
fetch the user row plus recent rows from ~10 child tables (ORDER BY created_at
DESC LIMIT n each), aggregate (SUM amounts), and concatenate everything into
one context string. The reference runs 10+ sequential point queries per user;
our plan computes the same result **for every user at once** as a single
DataFrame program — the difference between a 1-user/request service and a
100 TB batch engine.

Mapped onto the driver's star schema: customer ≈ users, orders ≈ the child
activity table. Per customer: top-10 most recent orders, their total spend,
and a context string of "date status total" lines, newest first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def user_context(customer: DataFrame, orders: DataFrame, recent_n: int = 10) -> DataFrame:
    """All-users context assembly. One shuffle (by o_custkey), rank + agg in
    the same exchange, then a broadcast-joinable result against customer.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    recent = (
        orders.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= recent_n)
    )
    line = F.format_string(
        "%s %s %.2f",
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
    )
    per_user = recent.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_recent"),
        F.round(F.sum("o_totalprice"), 2).alias("recent_spend"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_rn").alias("o"), line.alias("l")))
                ),
                lambda s: s["l"],
            ),
            "\n",
        ).alias("context"),
    )
    return (
        customer.join(per_user, customer.c_custkey == per_user.o_custkey, "inner")
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            "n_recent",
            "recent_spend",
            "context",
        )
    )
