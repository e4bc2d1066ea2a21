"""Korean anchor extraction semantics + bucketed co-located join demo."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from backend_fastapi_spark.functions.anchors import extract_anchors, strong_anchors
from tests.conftest import SF_ORACLE


def test_anchor_extraction_korean():
    got = extract_anchors("어텐션 메커니즘이 뭐야? attention please")
    assert "어텐션" in got and "메커니즘이" in got
    assert "attention" in got            # synonym of 어텐션 + literal token
    assert "뭐야" not in got             # stopword
    # NFKC: fullwidth → ascii before tokenization
    assert "rag" in extract_anchors("ＲＡＧ 설명해줘")
    # synonym injection for rag
    assert "검색증강" in extract_anchors("rag 설명해줘")


def test_strong_anchors_filtering():
    got = strong_anchors("ai rag faiss attention 어텐션")
    assert "faiss" in got and "attention" in got and "어텐션" in got
    assert "ai" not in got               # len < 2 → not even an anchor
    assert "rag" not in got              # len 3, no hangul → weak anchor
    # but rag's Korean synonyms are strong
    assert "검색증강" in got


def test_bucketed_join_avoids_shuffle(spark):
    """Bucketed tables joined on the bucket key: no Exchange in the plan —
    the co-located-join recipe for repeated large joins at 100 TB."""
    # warehouse.dir is a static conf — tables land in ./spark-warehouse;
    # dropped (and the dir removed) on the way out
    wh = "spark-warehouse"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    try:
        orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        customer = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
        (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
         .mode("overwrite").format("parquet").saveAsTable("b_orders"))
        (customer.withColumnRenamed("c_custkey", "o_custkey")
         .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
         .mode("overwrite").format("parquet").saveAsTable("b_customer"))

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
        try:
            joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
            import contextlib, io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "Exchange" not in plan, plan  # co-located: no shuffle
            assert joined.count() == orders.count()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
        shutil.rmtree(wh, ignore_errors=True)
