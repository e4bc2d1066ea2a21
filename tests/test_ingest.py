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


def test_compact_index_after_streaming_appends(spark, tmp_path):
    """Compaction rewrites one index partition into few files with
    identical rows; other index partitions keep their files."""
    import glob

    from backend_fastapi_spark.plans.ingest import (
        compact_index,
        ingest_table,
        write_index,
    )

    path = str(tmp_path / "idx")
    df = spark.createDataFrame(
        [(i, f"t{i}", f"document text number {i}. more words here.") for i in range(20)],
        ["id", "title", "content"],
    )
    # simulate many small appends for index A; one write for index B
    for i in range(0, 20, 5):
        part = df.filter((df.id >= i) & (df.id < i + 5))
        write_index(ingest_table(part, "idx_a"), path, mode="append")
    write_index(ingest_table(df, "idx_b"), path, mode="append")

    before = spark.read.parquet(path)
    rows_a_before = {
        (r.chunk_id, r.text)
        for r in before.filter(before.index_name == "idx_a").collect()
    }
    b_files_before = set(glob.glob(f"{path}/index_name=idx_b/*.parquet"))
    a_files_before = glob.glob(f"{path}/index_name=idx_a/*.parquet")
    assert len(a_files_before) >= 4

    n = compact_index(spark, path, "idx_a", target_files=1)
    assert n == len(rows_a_before)

    after = spark.read.parquet(path)
    rows_a_after = {
        (r.chunk_id, r.text)
        for r in after.filter(after.index_name == "idx_a").collect()
    }
    assert rows_a_after == rows_a_before
    assert len(glob.glob(f"{path}/index_name=idx_a/*.parquet")) == 1
    # dynamic overwrite left idx_b's files alone
    assert set(glob.glob(f"{path}/index_name=idx_b/*.parquet")) == b_files_before


def test_assemble_handles_meta_key_collision_and_string_ids(spark):
    """(id, source) tables must not crash create_map (duplicate 'source'
    key), and UUID-string ids must produce distinct doc_ids instead of
    cast-to-NULL collapsing every chunk_id."""
    from backend_fastapi_spark.plans.ingest import assemble_documents

    collide = spark.createDataFrame(
        [(1, "long text for the source column here")], ["id", "source"]
    )
    rows = assemble_documents(collide, "idx").collect()
    assert len(rows) == 1 and rows[0].doc_id == 1

    uuids = spark.createDataFrame(
        [("a-1", "text one"), ("b-2", "text two")], ["uid", "body"]
    )
    got = assemble_documents(uuids, "idx").collect()
    ids = {r.doc_id for r in got}
    assert len(ids) == 2 and None not in ids


def test_write_index_overwrite_is_partition_scoped(spark, tmp_path):
    """Overwriting index B must not wipe index A at the same path."""
    from backend_fastapi_spark.plans.ingest import ingest_table, write_index

    path = str(tmp_path / "idx")
    a = spark.createDataFrame([(1, "t", "doc a text")], ["id", "title", "content"])
    b = spark.createDataFrame([(2, "t", "doc b text")], ["id", "title", "content"])
    write_index(ingest_table(a, "index_a"), path)
    write_index(ingest_table(b, "index_b"), path)  # default overwrite
    names = {
        r.index_name
        for r in spark.read.parquet(path).select("index_name").distinct().collect()
    }
    assert names == {"index_a", "index_b"}


def test_rag_empty_anchors_is_noop_and_case_insensitive(spark):
    """anchors=[] must skip the P9 filter (not drop everything); an
    uppercase anchor must match the lowered haystack."""
    from backend_fastapi_spark.plans.rag_retrieval import rag_retrieve

    corpus = spark.createDataFrame(
        [(1, "vector databases are fast", "s", [1.0, 0.0])],
        "doc_id long, text string, source string, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "q_id long, q_embedding array<double>"
    )
    no_anchor = rag_retrieve(corpus, queries, anchors=[])
    assert no_anchor.count() == 1
    upper = rag_retrieve(corpus, queries, anchors=["Vector"])
    assert upper.count() == 1
