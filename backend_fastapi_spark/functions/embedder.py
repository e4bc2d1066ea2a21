"""Pluggable embedding boundary — SURVEY §2.9 V1.

The reference embeds with BAAI/bge-m3 on GPU (``embedding_handler.py:41-55``)
— non-deterministic across hardware and unavailable here. The engine
isolates embedding behind this interface:

- ``hashing_embedder``: the deterministic test/default implementation — a
  feature-hashing projection (token → seeded md5 → signed bucket), L2
  normalized. Pure function of the text; identical on every executor.
- ``sentence_transformer_embedder``: the production path, loading a real
  model inside the executor (import-gated; raises if the library is absent).

Both are exposed as Arrow-batched pandas UDFs (mapInPandas-compatible):
embedding is the canonical "slow path done right" — vectorized batches,
model loaded once per worker, never per row.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hash_embed_one(text: str, dim: int) -> list[float]:
    vec = [0.0] * dim
    for tok in text.lower().split():
        h = hashlib.md5(tok.encode("utf-8")).digest()
        bucket = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if h[4] & 1 else -1.0
        vec[bucket] += sign
    norm = math.sqrt(sum(v * v for v in vec))
    if norm > 0:
        vec = [v / norm for v in vec]
    return vec


def hashing_embedder(dim: int = 64):
    """Deterministic pandas UDF: text → ARRAY<FLOAT> (L2-normalized)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batch: pd.Series) -> pd.Series:
        return batch.map(lambda t: _hash_embed_one(t or "", dim))

    return embed


def sentence_transformer_embedder(model_name: str = "BAAI/bge-m3", dim: int = 1024):
    """Production embedder: sentence-transformers inside the executor.
    Import-gated — this container has no GPU/model; the UDF shape and batch
    plumbing are identical to the hashing embedder, so swapping is a
    one-line config change."""
    try:
        import sentence_transformers  # noqa: F401
    except ImportError as e:  # pragma: no cover - not installed here
        raise NotImplementedError(
            "sentence-transformers not available in this environment; "
            "use hashing_embedder() or install the model runtime"
        ) from e

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:  # pragma: no cover
        from sentence_transformers import SentenceTransformer

        # worker-global cache: the iterator-UDF body runs once per TASK,
        # so a bare constructor here would reload the multi-GB model
        # once per partition; the module-level dict persists across
        # tasks in the same Python worker process.
        cache = globals().setdefault("_ST_MODELS", {})
        if model_name not in cache:
            cache[model_name] = SentenceTransformer(model_name)
        model = cache[model_name]
        for batch in it:
            vecs = model.encode(
                batch.fillna("").tolist(), normalize_embeddings=True
            )
            yield pd.Series([np.asarray(v, dtype=np.float32).tolist() for v in vecs])

    return embed
