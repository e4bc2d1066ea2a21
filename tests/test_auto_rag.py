"""Auto-RAG loop (§3.3) + IVF index persistence with partition pruning."""

from __future__ import annotations

import contextlib
import io
import shutil
import tempfile

from pyspark.sql import functions as F

from backend_fastapi_spark.plans.auto_rag import run_auto_rag, search_corpus
from tests.conftest import SF_ORACLE


def test_auto_rag_loop(spark):
    tmp = tempfile.mkdtemp(prefix="autorag_idx_")
    try:
        docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        ctx, progress = run_auto_rag(
            spark, docs, "vector merge scan", index_path=tmp, top_k=8
        )
        rows = ctx.collect()
        assert len(rows) == 8
        scores = [r.score_i64 for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert [p["status"] for p in progress] == ["searched", "ingested", "retrieved"]
        assert progress[0]["n"] > 0 and progress[-1]["progress"] == 100

        # incremental append (S13): a second run grows the same index
        before = spark.read.parquet(tmp).count()
        run_auto_rag(spark, docs.limit(10), "table window", index_path=tmp)
        assert spark.read.parquet(tmp).count() > before
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_search_corpus_or_semantics(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    both = search_corpus(docs, ["vector", "stream"], limit=10_000).count()
    one = search_corpus(docs, ["vector"], limit=10_000).count()
    assert both >= one > 0


def test_ivf_persisted_partition_pruning(spark):
    """IVF inverted lists as cluster partitions: a probe of 2 clusters reads
    only those partitions (PartitionFilters in the scan)."""
    from backend_fastapi_spark.operators.ivf import build_ivf

    tmp = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        assigned, centroids = build_ivf(emb, k_clusters=8)
        assigned.write.partitionBy("cluster").mode("overwrite").parquet(tmp)

        index = spark.read.parquet(tmp)
        probed = index.filter(F.col("cluster").isin(2, 5))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            probed.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters" in plan and "cluster" in plan
        assert probed.count() == assigned.filter(F.col("cluster").isin(2, 5)).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
