"""Recorded-fixture drift test for the production bge-m3 embedder
(VERDICT r12 directive #8): the import-gated sentence-transformers path
has identical UDF plumbing to the deterministic hashing embedder, but its
OUTPUT had no drift detection. This test gives it one without putting a
GPU or network in CI:

- In a model-enabled environment, the first run RECORDS an 8-row encode
  fixture (tests/fixtures/bge_m3_8row.json) — real model output, never
  fabricated; commit the file that run produces.
- Later runs compare fresh encodes against the recording (cosine ≥
  0.999 per row — hardware/runtime float slack, far tighter than any
  semantic drift), so a silently changed model revision or a broken
  batch path fails loudly.
- Without the library the test SKIPS (the honest state: this container
  ships no model, and inventing "expected" bge-m3 numbers would make the
  fixture a lie).

The import-gate behavior itself (NotImplementedError when the library is
absent) is covered in test_functions.py; this file only guards the
model-present path.
"""

from __future__ import annotations

import json
import math
import os

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "bge_m3_8row.json")

# Fixed probe texts: plain English, Korean (the reference's domain),
# mixed-script, whitespace-noise, empty, and a long row that forces the
# model's own truncation — the shapes a production ingest actually sends.
TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "distributed query engines shuffle data between executors",
    "서울의 잠실 롯데월드타워는 대한민국에서 가장 높은 건물이다",
    "vector search finds the nearest 임베딩 in cosine space",
    "  spaced    out\ttokens \n with   noise  ",
    "",
    "a",
    "token " * 600,
]


def test_bge_m3_recorded_fixture(spark):
    pytest.importorskip("sentence_transformers")

    from backend_fastapi_spark.functions.embedder import (
        sentence_transformer_embedder,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    rows = (
        df.withColumn("emb", sentence_transformer_embedder()("text"))
        .orderBy("id")
        .collect()
    )
    got = [list(map(float, r.emb)) for r in rows]
    assert len(got) == len(TEXTS)
    dims = {len(v) for v in got}
    assert len(dims) == 1, f"ragged embedding dims: {dims}"
    for v in got:
        norm = math.sqrt(sum(x * x for x in v))
        assert abs(norm - 1.0) < 1e-3  # normalize_embeddings=True

    if not os.path.exists(FIXTURE):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        with open(FIXTURE, "w") as f:
            json.dump(
                {"model": "BAAI/bge-m3", "texts": TEXTS, "embeddings": got},
                f,
            )
        pytest.skip(
            f"recorded new fixture at {FIXTURE} — commit it; subsequent "
            "runs will compare against it"
        )

    with open(FIXTURE) as f:
        rec = json.load(f)
    assert rec["texts"] == TEXTS, (
        "fixture texts diverged from the test's probe set — re-record"
    )
    assert len(rec["embeddings"]) == len(got)
    for i, (a, b) in enumerate(zip(rec["embeddings"], got)):
        assert len(a) == len(b), f"row {i}: dim {len(a)} -> {len(b)}"
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        cos = dot / (na * nb) if na and nb else 1.0
        assert cos >= 0.999, (
            f"row {i} drifted: cosine {cos:.6f} vs recorded fixture "
            f"(model revision change or broken batch path?)"
        )
