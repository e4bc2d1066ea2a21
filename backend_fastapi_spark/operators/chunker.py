"""Recursive separator-ladder chunker — LangChain-parity text splitting.

The reference chunks documents with LangChain's
``RecursiveCharacterTextSplitter`` (``rag_service.py:78-83`` size 800 /
overlap 80 defaults; ``enhanced_internal_db_service.py:591-600`` size 700 /
overlap 120 with the explicit ladder
``["\\n\\n","\\n","。",". ",".","? ","?","! ","!"," "]``;
``config/backend_config.yaml:49-65``). Chunk boundaries decide retrieval
results, so parity here is user-visible on every RAG query.

``recursive_split`` is a from-scratch reimplementation of the public
LangChain algorithm (MIT-licensed, widely documented): pick the first
ladder separator present in the text, split keeping the separator glued to
the *start* of the following piece (``keep_separator=True`` default),
greedily merge pieces into chunks of at most ``chunk_size`` chars with a
sliding tail of at most ``chunk_overlap`` chars carried into the next
chunk, and recurse with the rest of the ladder on any piece that alone
exceeds ``chunk_size``. Whitespace is stripped from finished chunks and
empty chunks dropped (``strip_whitespace=True`` default).

Spark form: a vectorized pandas UDF (Arrow batches) mapping
``text -> array<string>`` + ``posexplode`` — rows fan out in place with no
shuffle, so chunking 100 TB is embarrassingly parallel. The Python
boundary is unavoidable (the algorithm is an inherently sequential
per-document scan) but it is per-*document*, not per-row-of-output, and
batched via Arrow.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# The reference's explicit ladder (enhanced_internal_db_service.py:591-600).
# NOTE: no "" terminator — an unsplittable oversized piece is emitted as-is,
# exactly like the reference's configuration.
REFERENCE_SEPARATORS = ["\n\n", "\n", "。", ". ", ".", "? ", "?", "! ", "!", " "]
# LangChain's own default ladder (rag_service.py uses the defaults).
DEFAULT_SEPARATORS = ["\n\n", "\n", " ", ""]


def _split_on(text: str, sep: str) -> list[str]:
    """Split keeping the separator at the start of the following piece
    (LangChain ``keep_separator=True``); drop empty pieces."""
    if sep == "":
        return list(text)
    pieces = text.split(sep)
    out = [pieces[0]] + [sep + p for p in pieces[1:]]
    return [p for p in out if p]


def _join_chunk(parts: list[str], strip_whitespace: bool) -> str | None:
    text = "".join(parts)
    if strip_whitespace:
        text = text.strip()
    return text or None


def _merge_pieces(
    pieces: Iterable[str],
    chunk_size: int,
    chunk_overlap: int,
    strip_whitespace: bool,
) -> list[str]:
    """Greedy merge with sliding overlap: accumulate pieces up to
    ``chunk_size``; on overflow, emit the chunk and pop from the front
    until at most ``chunk_overlap`` chars (and room for the new piece)
    remain — those survivors start the next chunk."""
    chunks: list[str] = []
    current: list[str] = []
    total = 0
    for piece in pieces:
        plen = len(piece)
        if total + plen > chunk_size and current:
            joined = _join_chunk(current, strip_whitespace)
            if joined is not None:
                chunks.append(joined)
            while total > chunk_overlap or (total + plen > chunk_size and total > 0):
                total -= len(current[0])
                current = current[1:]
        current.append(piece)
        total += plen
    joined = _join_chunk(current, strip_whitespace)
    if joined is not None:
        chunks.append(joined)
    return chunks


def recursive_split(
    text: str,
    chunk_size: int = 700,
    chunk_overlap: int = 120,
    separators: list[str] | None = None,
    strip_whitespace: bool = True,
) -> list[str]:
    """Split ``text`` into chunks of at most ``chunk_size`` characters
    (except pieces unsplittable by the remaining ladder), overlapping by at
    most ``chunk_overlap``. Pure and deterministic — shared by the Spark
    operator, the golden tests, and the ingest plan."""
    seps = REFERENCE_SEPARATORS if separators is None else separators
    return _split_recursive(text, chunk_size, chunk_overlap, seps, strip_whitespace)


def _split_recursive(
    text: str,
    chunk_size: int,
    chunk_overlap: int,
    separators: list[str],
    strip_whitespace: bool,
) -> list[str]:
    # First ladder separator present in the text wins; "" always matches.
    sep = separators[-1] if separators else ""
    rest: list[str] = []
    for i, s in enumerate(separators):
        if s == "" or s in text:
            sep = s
            rest = separators[i + 1 :]
            break

    pieces = _split_on(text, sep)
    final: list[str] = []
    pending: list[str] = []  # small pieces awaiting a greedy merge
    for piece in pieces:
        if len(piece) < chunk_size:
            pending.append(piece)
            continue
        if pending:
            final.extend(
                _merge_pieces(pending, chunk_size, chunk_overlap, strip_whitespace)
            )
            pending = []
        if not rest:
            final.append(piece)  # unsplittable by the remaining ladder
        else:
            final.extend(
                _split_recursive(piece, chunk_size, chunk_overlap, rest, strip_whitespace)
            )
    if pending:
        final.extend(
            _merge_pieces(pending, chunk_size, chunk_overlap, strip_whitespace)
        )
    return final


def recursive_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 700,
    chunk_overlap: int = 120,
    separators: list[str] | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Distributed recursive chunking: (id, [carry...], chunk_idx, chunk)
    per document.

    Narrow plan — pandas UDF (Arrow) + posexplode, no shuffle; scales
    linearly with document count. ``carry_cols`` ride along through the
    fan-out so callers never need a join back to the document table
    (which would be a shuffle — and stream-illegal in a streaming plan).
    """
    seps = REFERENCE_SEPARATORS if separators is None else separators

    @F.pandas_udf(ArrayType(StringType()))
    def _chunks(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: _split_recursive(
                t or "", chunk_size, chunk_overlap, seps, True
            )
        )

    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (carry_cols or [])],
        F.posexplode(_chunks(F.col(text_col))).alias("chunk_idx", "chunk"),
    )
