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
from backend_fastapi_spark.operators.chunker import recursive_chunks

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


def infer_text_columns(columns: list[str]) -> list[str]:
    """ALL text-candidate columns present, in candidate order — the
    reference assembles one "{col}: {content}" line AND one metadata key
    per text column (internal_db_service.py:295-302, enhanced:566-577),
    not just the first match. Falls back to the single inferred column."""
    lower = {c.lower(): c for c in columns}
    found = [lower[cand] for cand in TEXT_CANDIDATES if cand in lower]
    return found or [infer_doc_columns(columns)[2]]


# Metadata-value truncation (enhanced_internal_db_service.py:575-577).
METADATA_VALUE_MAX_CHARS = 3000


def assemble_documents(df: DataFrame, index_name: str) -> DataFrame:
    """Document assembly (internal_db_service.py:285-313): doc text is
    "제목: {title}" plus one "{col}: {content}" line per non-empty text
    column; metadata carries id, title, a source tag, and one key per text
    column truncated to 3000 chars (enhanced:566-577).

    Returns (doc_id, title, doc_text, index_name, metadata).
    """
    id_col, title_col, _ = infer_doc_columns(df.columns)
    text_cols = infer_text_columns(df.columns)
    title = F.coalesce(F.col(title_col).cast("string"), F.lit("Unknown"))

    def col_line(c: str):
        v = F.trim(F.col(c).cast("string"))
        return F.when(v.isNotNull() & (v != ""), F.concat(F.lit(f"{c}: "), v))

    # concat_ws skips NULLs — exactly the reference's "append if non-empty".
    doc_text = F.concat_ws(
        "\n", F.concat(F.lit("제목: "), title), *[col_line(c) for c in text_cols]
    )
    meta_entries: list = [
        F.lit("id"), F.col(id_col).cast("string"),
        F.lit("title"), title,
        F.lit("source"), F.lit(index_name),
    ]
    for c in text_cols:
        if c in ("id", "title", "source"):
            # the fallback text column can BE one of the fixed meta keys
            # (e.g. a (id, source) table infers 'source' as text) —
            # emitting the key twice makes create_map raise under the
            # default mapKeyDedupPolicy=EXCEPTION for every row
            continue
        meta_entries += [
            F.lit(c),
            F.substring(F.col(c).cast("string"), 1, METADATA_VALUE_MAX_CHARS),
        ]
    metadata = F.map_filter(
        F.create_map(*meta_entries), lambda _, v: v.isNotNull()
    )
    # numeric ids cast losslessly; string ids (UUIDs) would cast to NULL
    # — collapsing every doc's chunk_id (xxhash64 skips NULL args) — so
    # they hash to a stable long instead.
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    if isinstance(id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        doc_id = F.col(id_col).cast("long")
    else:
        doc_id = F.xxhash64(F.col(id_col).cast("string"))
    return df.select(
        doc_id.alias("doc_id"),
        title.alias("title"),
        doc_text.alias("doc_text"),
        F.lit(index_name).alias("index_name"),
        metadata.alias("metadata"),
    )


def ingest_table(
    df: DataFrame,
    index_name: str,
    chunk_size: int = 700,
    chunk_overlap: int = 120,
    embed_dim: int = 64,
) -> DataFrame:
    """Full §3.2 pipeline, returning the chunks+embeddings DataFrame ready
    for ``write.partitionBy("index_name")`` (S11). Chunking is the
    LangChain-parity recursive splitter (reference 700/120,
    enhanced:591-600); per-column metadata rides along from assembly."""
    docs = assemble_documents(df, index_name)
    # title/index/metadata CARRY through the chunk fan-out instead of
    # joining back to the document table afterwards: one less shuffle,
    # and the whole plan stays narrow — legal (and exactly-once) as a
    # Structured Streaming source→file-sink pipeline
    # (streaming/ingest_stream.py).
    with_meta = recursive_chunks(
        docs.withColumnRenamed("doc_text", "text"),
        text_col="text",
        id_col="doc_id",
        chunk_size=chunk_size,
        chunk_overlap=chunk_overlap,
        carry_cols=["title", "index_name", "metadata"],
    ).withColumn("chunk_id", F.xxhash64("doc_id", "chunk_idx"))
    embed = hashing_embedder(dim=embed_dim)
    return with_meta.select(
        "chunk_id",
        "doc_id",
        "index_name",
        "title",
        F.col("chunk").alias("text"),
        embed(F.col("chunk")).alias("embedding"),
        "metadata",
    )


def write_index(chunks: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S11 vector-index sink: parquet partitioned by index_name (partition
    pruning = the reference's per-index FAISS directories).

    Overwrites are DYNAMIC: only the index partitions present in
    ``chunks`` rewrite — a static overwrite would truncate the whole
    path and wipe every OTHER index living there (the isolation the
    per-index-directory docstring promises)."""
    (
        chunks.write.partitionBy("index_name")
        .option("partitionOverwriteMode", "dynamic")
        .mode(mode)
        .parquet(path)
    )


def compact_index(
    spark, path: str, index_name, target_files: int = 1,
    partition_col: str = "index_name",
) -> int:
    """Small-file compaction for one index partition — the maintenance op
    continuous ingest (streaming/ingest_stream.py) makes necessary: every
    micro-batch appends a file, and a 100 TB index read pays per-file
    open/footer cost. Rewrites ONLY the named partition (dynamic partition
    overwrite — other indexes' partitions untouched, readers of them
    unaffected) into ``target_files`` files.

    ``partition_col`` generalizes the op to any partition-keyed index
    layout: the document index partitions by ``index_name``, the IVF
    inverted lists by ``cluster`` (operators/ivf.py::ivf_append grows a
    cluster by one file per batch — this is its compaction twin).

    The rows are materialized (lineage cut) BEFORE the overwrite so the
    write never reads the files it is replacing. Returns the row count of
    the compacted partition (the materialize forces it anyway, and callers
    want the sanity number).
    """
    from backend_fastapi_spark.operators.util import materialize

    part = spark.read.parquet(path).filter(F.col(partition_col) == index_name)
    staged = materialize(part.repartition(target_files))
    n = staged.count()
    (
        staged.write.partitionBy(partition_col)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    return n
