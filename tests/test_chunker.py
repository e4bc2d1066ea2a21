"""Golden + parity tests for the LangChain-parity recursive chunker.

The golden expectations below were hand-derived by tracing the public
RecursiveCharacterTextSplitter algorithm (keep_separator at start,
strip_whitespace, greedy merge with sliding overlap) — they pin the exact
boundary behavior the reference's RAG ingest depends on
(rag_service.py:78-83, enhanced_internal_db_service.py:591-600).
"""

from __future__ import annotations

import pandas as pd
import pytest

from backend_fastapi_spark.operators.chunker import (
    DEFAULT_SEPARATORS,
    REFERENCE_SEPARATORS,
    recursive_chunks,
    recursive_split,
)


def test_char_ladder_merges_to_size():
    assert recursive_split("abcdefghij", 4, 0, [""]) == ["abcd", "efgh", "ij"]


def test_word_ladder_with_overlap():
    # size 5, overlap 2 over "a b c d e f": LangChain emits a sliding
    # overlap of one word ('c d', 'd e', ...), separator glued to start.
    assert recursive_split("a b c d e f", 5, 2, DEFAULT_SEPARATORS) == [
        "a b c",
        "c d",
        "d e",
        "e f",
    ]


def test_sentence_ladder_keeps_separator_at_start():
    text = "One. Two. Three. Four. Five. Six. Seven. Eight."
    out = recursive_split(text, 20, 5, REFERENCE_SEPARATORS)
    assert out == ["One. Two. Three", ". Four. Five. Six", ". Six. Seven. Eight."]
    assert all(len(c) <= 20 for c in out)


def test_paragraph_then_word_recursion():
    text = "para one is here.\n\npara two follows, longer than before.\n\nshort."
    out = recursive_split(text, 30, 10)
    # every chunk within size; all content covered in order
    assert all(len(c) <= 30 for c in out)
    joined = " ".join(out)
    for frag in ["para one is here.", "para two follows,", "short."]:
        assert frag in joined


def test_empty_and_oversized_unsplittable():
    assert recursive_split("", 10, 2) == []
    # no remaining ladder separator can split it -> emitted as-is
    assert recursive_split("x" * 50, 10, 2, [" "]) == ["x" * 50]


def test_overlap_never_exceeds_configured():
    text = " ".join(f"w{i:03d}" for i in range(400))
    out = recursive_split(text, 100, 20)
    assert all(len(c) <= 100 for c in out)
    for a, b in zip(out, out[1:]):
        # the shared suffix/prefix is bounded by overlap + one separator
        ov = 0
        for k in range(min(len(a), len(b)), 0, -1):
            if a.endswith(b[:k]):
                ov = k
                break
        assert ov <= 20 + 1


def test_reference_config_700_120_properties():
    para = "문장 하나다. " * 40  # ~280 chars per paragraph
    text = "\n\n".join(para for _ in range(10))
    out = recursive_split(text, 700, 120)
    assert all(len(c) <= 700 for c in out)
    assert len(out) >= 3


def test_spark_operator_matches_pure_python(spark):
    texts = [
        "One. Two. Three. Four. Five. Six. Seven. Eight.",
        "para one.\n\npara two is a bit longer.\n\nshort.",
        "",
        "x" * 95,
        ("word " * 50).strip(),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = (
        recursive_chunks(df, chunk_size=30, chunk_overlap=10)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    want = []
    for i, t in enumerate(texts):
        for j, c in enumerate(recursive_split(t, 30, 10)):
            want.append((i, j, c))
    assert [(r.doc_id, r.chunk_idx, r.chunk) for r in got] == want
