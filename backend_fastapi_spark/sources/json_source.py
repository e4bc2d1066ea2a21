"""Nested JSON source — SURVEY §2.1 S6 / §1.4 (grocery_deals.json).

Reference loads the file driver-side and flattens by hand
(``grocery_rag_service.py:27-86``); Spark reads it as
``ArrayType(StructType(...))`` and ``explode`` does the flattening inside
the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GROCERY_PATH = "/root/repo/data/grocery_deals.json"


def read_grocery_deals(spark: SparkSession, path: str = GROCERY_PATH) -> DataFrame:
    """multiLine JSON array → one row per (product, store) after explode."""
    raw = spark.read.option("multiLine", "true").json(path)
    return raw.select(
        "category",
        "product",
        "unit",
        F.explode("stores").alias("s"),
    ).select(
        "category",
        "product",
        "unit",
        F.col("s.name").alias("store"),
        F.col("s.price").alias("price"),
        F.col("s.location").alias("location"),
        F.col("s.discount").alias("discount"),
    )
