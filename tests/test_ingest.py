"""Ingest-plan tests: schema inference candidate sets, end-to-end
index build + kNN query-back (the §3.2 → §3.1 loop)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from backend_fastapi_spark.plans.ingest import (
    infer_doc_columns,
    ingest_table,
    write_index,
)
from backend_fastapi_spark.operators import vector as V
from tests.conftest import SF_ORACLE


def test_infer_doc_columns_candidates():
    assert infer_doc_columns(["id", "term", "description"]) == (
        "id", "term", "description",
    )
    assert infer_doc_columns(["pk", "name", "body", "extra"]) == ("pk", "name", "body")
    # positional fallback: no candidates → first/second/last
    assert infer_doc_columns(["a", "b", "c"]) == ("a", "b", "c")
    # case-insensitive
    assert infer_doc_columns(["ID", "Title", "Content"]) == ("ID", "Title", "Content")


def test_ingest_index_build_and_query_back(spark):
    """Build the index from documents, persist partitioned, query it with
    an embedded query — the reference's ingest→query loop end-to-end."""
    tmp = tempfile.mkdtemp(prefix="ingest_idx_")
    try:
        docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(100)
        chunks = ingest_table(docs, "knowledge")
        write_index(chunks, tmp)

        back = spark.read.parquet(tmp).filter(F.col("index_name") == "knowledge")
        assert back.count() >= 100  # every doc yields ≥1 chunk
        row = back.head()
        assert row.text.startswith("제목: ")
        assert abs(sum(x * x for x in row.embedding) - 1.0) < 1e-5
        assert row.metadata["id"] == str(row.doc_id)

        # query-back: embed a query, exact kNN over the persisted index
        from backend_fastapi_spark.functions.embedder import hashing_embedder

        embed = hashing_embedder(dim=64)
        qdf = (
            spark.createDataFrame([("q", "passage: table scan merge")], ["q_id", "t"])
            .select("q_id", embed("t").alias("q_embedding"))
        )
        hits = V.knn_exact(
            back.select("chunk_id", "embedding"),
            qdf,
            k=5,
            corpus_id="chunk_id",
            exclude_self=False,
        )
        got = hits.collect()
        assert len(got) == 5
        assert got[0].score_i64 >= got[-1].score_i64
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
