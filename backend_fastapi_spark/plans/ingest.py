"""Flagship plan #3: the ingestion/index-build pipeline (SURVEY §3.2).

Reference (``enhanced_internal_db_service.py:167-228``): table scan →
schema inference (id/title/text candidate-name sets, §1.3) → document
assembly ("제목: {t}" templates + per-column metadata) → chunk split →
batch embed → FAISS build + disk sink.

Spark restatement — ONE lazy plan, executed distributed:
``scan → select/concat_ws → chunk (sequence+explode) → embed (pandas UDF)
→ write parquet partitioned by index_name``. The embedding stage is the
only Python boundary; everything else is whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_fastapi_spark.functions.embedder import hashing_embedder
from backend_fastapi_spark.operators.text import char_chunks

# Candidate-name sets for dynamic schema inference
# (enhanced_internal_db_service.py:454-473; internal_db_service.py:255-283).
ID_CANDIDATES = ("id", "pk", "gid", "uid", "doc_id", "vec_id")
TITLE_CANDIDATES = ("title", "name", "term", "subject", "source")
TEXT_CANDIDATES = ("body", "content", "description", "text", "details")


def infer_doc_columns(columns: list[str]) -> tuple[str, str, str]:
    """Pick (id, title, text) columns by candidate-name sets with positional
    fallback — a driver-side function over df.columns, not a Catalyst
    concern (SURVEY §1.3)."""
    lower = {c.lower(): c for c in columns}

    def pick(cands: tuple[str, ...], fallback_idx: int) -> str:
        for cand in cands:
            if cand in lower:
                return lower[cand]
        return columns[min(fallback_idx, len(columns) - 1)]

    id_col = pick(ID_CANDIDATES, 0)
    title_col = pick(TITLE_CANDIDATES, 1)
    text_col = pick(TEXT_CANDIDATES, len(columns) - 1)
    return id_col, title_col, text_col


def assemble_documents(df: DataFrame, index_name: str) -> DataFrame:
    """Document assembly with expansion template (reference builds
    "제목: {t}\\n{col}: {v}" strings + "passage: " prefixes,
    enhanced:542-579): (doc_id, title, doc_text, index_name)."""
    id_col, title_col, text_col = infer_doc_columns(df.columns)
    doc_text = F.concat(
        F.lit("제목: "),
        F.col(title_col).cast("string"),
        F.lit("\n"),
        F.lit("passage: "),
        F.col(text_col).cast("string"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(title_col).cast("string").alias("title"),
        doc_text.alias("doc_text"),
        F.lit(index_name).alias("index_name"),
    )


def ingest_table(
    df: DataFrame,
    index_name: str,
    chunk_size: int = 700,
    chunk_overlap: int = 120,
    embed_dim: int = 64,
) -> DataFrame:
    """Full §3.2 pipeline, returning the chunks+embeddings DataFrame ready
    for ``write.partitionBy("index_name")`` (S11). Chunk stride =
    size − overlap (reference 700/120)."""
    docs = assemble_documents(df, index_name)
    chunks = char_chunks(
        docs.withColumnRenamed("doc_text", "text"),
        text_col="text",
        id_col="doc_id",
        size=chunk_size,
        stride=chunk_size - chunk_overlap,
    )
    with_meta = (
        chunks.join(docs.select("doc_id", "title", "index_name"), "doc_id")
        .withColumn("chunk_id", F.xxhash64("doc_id", "chunk_idx"))
    )
    embed = hashing_embedder(dim=embed_dim)
    return with_meta.select(
        "chunk_id",
        "doc_id",
        "index_name",
        "title",
        F.col("chunk").alias("text"),
        embed(F.col("chunk")).alias("embedding"),
        F.create_map(
            F.lit("id"), F.col("doc_id").cast("string"),
            F.lit("title"), F.col("title"),
        ).alias("metadata"),
    )


def write_index(chunks: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S11 vector-index sink: parquet partitioned by index_name (partition
    pruning = the reference's per-index FAISS directories)."""
    chunks.write.partitionBy("index_name").mode(mode).parquet(path)
