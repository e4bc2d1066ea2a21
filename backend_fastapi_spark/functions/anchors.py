"""Query-side anchor extraction — the reference's exact semantics
(``enhanced_internal_db_service.py:729-755``), driver-side like the
reference (runs once per query, not per row):

- NFKC-normalize + lowercase
- tokenize with the Korean/Latin regex ``[가-힣A-Za-z0-9][가-힣A-Za-z0-9\\-_/]+``
- keep tokens of length ≥ 2, drop stopwords
- inject domain synonyms (rag/faiss/attention families)
- "strong" anchors = tokens of length ≥ 4 or containing Hangul
"""

from __future__ import annotations

import re
import unicodedata

TOKEN_RE = re.compile(r"[가-힣A-Za-z0-9][가-힣A-Za-z0-9\-_/]+")

STOPWORDS_KO_EN = {
    "그리고", "그러나", "하지만", "에서", "으로", "입니다",
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "for", "what",
    "about", "뭐야", "무엇", "알려줘", "설명",
}

# Domain synonym injection (reference: rag/faiss/attention expansions).
SYNONYMS: dict[str, list[str]] = {
    "rag": ["retrieval", "검색증강", "검색"],
    "faiss": ["벡터검색", "vector"],
    "attention": ["어텐션", "셀프어텐션"],
    "어텐션": ["attention"],
}


def extract_anchors(query: str) -> list[str]:
    """All anchors (deduped, first-seen order)."""
    norm = unicodedata.normalize("NFKC", query).lower()
    toks = [t for t in TOKEN_RE.findall(norm) if len(t) >= 2]
    anchors: list[str] = []
    seen: set[str] = set()
    for t in toks:
        if t in STOPWORDS_KO_EN or t in seen:
            continue
        seen.add(t)
        anchors.append(t)
        for syn in SYNONYMS.get(t, []):
            if syn not in seen:
                seen.add(syn)
                anchors.append(syn)
    return anchors


def _has_hangul(s: str) -> bool:
    return any("가" <= ch <= "힣" for ch in s)


def strong_anchors(query: str) -> list[str]:
    """Anchors used for the containment filter (P9): length ≥ 4 or Hangul."""
    return [a for a in extract_anchors(query) if len(a) >= 4 or _has_hangul(a)]
