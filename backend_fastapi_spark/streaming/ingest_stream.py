"""Continuous ingestion: the §3.2 ingest pipeline as a Structured
Streaming job.

The reference ingests on demand per HTTP request
(``enhanced_internal_db_service.py:167-228``); the streaming restatement
runs the IDENTICAL transformation chain (``plans/ingest.py::ingest_table``
— schema inference → assembly → recursive chunking → embedding) over a
streaming source and appends to the partitioned parquet index. This works
because the batch plan is deliberately narrow (no joins, no aggregates):
the chunk fan-out carries document metadata along instead of joining back,
so the same code object serves batch and stream.

Delivery semantics: the parquet file sink + checkpoint give exactly-once
per micro-batch — a crashed job resumes from the checkpoint without
duplicating chunks. Readers prune by ``index_name`` partition exactly as
with batch-written indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from backend_fastapi_spark.plans.ingest import ingest_table


def stream_ingest(
    docs_stream: DataFrame,
    index_name: str,
    index_path: str,
    checkpoint_path: str,
    **ingest_kwargs,
) -> StreamingQuery:
    """Start the continuous ingest: ``docs_stream`` (any schema the batch
    inference handles) → chunks+embeddings appended to
    ``{index_path}/index_name={index_name}/``. Returns the running
    StreamingQuery (caller owns stop/await)."""
    chunks = ingest_table(docs_stream, index_name, **ingest_kwargs)
    return (
        chunks.writeStream.format("parquet")
        .partitionBy("index_name")
        .outputMode("append")
        .option("path", index_path)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
