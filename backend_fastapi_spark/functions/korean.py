"""Korean/Unicode scalar UDFs — SURVEY §2.8 (NFKC, particle selection).

These are the reference's only string ops with no Spark builtin:
- NFKC normalization (``enhanced_internal_db_service.py:739,761,894``)
- 은/는 topic-particle selection by final jamo
  (``enhanced_internal_db_service.py:865-874``)

Both are Arrow-batched pandas UDFs (pure python-level unicode arithmetic,
no model/library): the cost is one Arrow hop, amortized over batches.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

HANGUL_BASE = 0xAC00
HANGUL_LAST = 0xD7A3
JONGSEONG_COUNT = 28


def nfkc_one(s: str | None) -> str | None:
    return None if s is None else unicodedata.normalize("NFKC", s)


def has_final_consonant(word: str) -> bool:
    """True if the last Hangul syllable carries a final consonant (받침)."""
    if not word:
        return False
    ch = ord(word[-1])
    if HANGUL_BASE <= ch <= HANGUL_LAST:
        return (ch - HANGUL_BASE) % JONGSEONG_COUNT != 0
    return False


def topic_particle(word: str | None) -> str:
    """은 after a final consonant, 는 otherwise (reference 은/는 logic)."""
    if not word:
        return "는"
    return "은" if has_final_consonant(word) else "는"


@F.pandas_udf(T.StringType())
def nfkc_udf(batch: pd.Series) -> pd.Series:
    return batch.map(nfkc_one)


@F.pandas_udf(T.StringType())
def topic_particle_udf(batch: pd.Series) -> pd.Series:
    return batch.map(topic_particle)


def with_topic_particle(word_col):
    """``term`` → ``term은``/``term는`` (deterministic, testable L4 op)."""
    return F.concat(word_col, topic_particle_udf(word_col))
