"""Property-based tests (hypothesis) for operator invariants.

Driver-side pure functions get full hypothesis treatment; Spark-backed
operators get a bounded number of generated cases per run (each Spark job
costs seconds).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from backend_fastapi_spark.functions.embedder import _hash_embed_one
from backend_fastapi_spark.plans.ingest import infer_doc_columns
from backend_fastapi_spark.streaming.sentence_stream import DELIMS, split_complete
from backend_fastapi_spark.tools import parse_tool_call


# ---------------------------------------------------------------------------
# pure driver-side functions — full hypothesis
# ---------------------------------------------------------------------------

@given(st.text(max_size=300))
def test_split_complete_conserves_text(s):
    """Emitted sentences + remainder reassemble the input (modulo the
    stripped inter-sentence whitespace)."""
    done, rest = split_complete(s)
    # every emitted sentence is non-empty, stripped, and delimiter-free
    # before its final char (the terminating delimiter itself is stripped
    # away when it is whitespace, e.g. '\n')
    for sent in done:
        assert sent and sent == sent.strip()
        assert not any(ch in DELIMS for ch in sent[:-1])
    # remainder contains no delimiter
    assert not any(ch in rest for ch in DELIMS)
    # character conservation: non-whitespace chars are preserved in order
    squash = lambda t: "".join(t.split())
    assert squash("".join(done) + rest) == squash(s)


@given(st.text(max_size=200))
def test_parse_tool_call_never_raises(s):
    parse_tool_call(s)            # arbitrary garbage must not raise
    parse_tool_call("TOOL_CALL: " + s)


@given(
    st.lists(st.sampled_from(["id", "uid", "name", "title", "body", "text",
                              "colx", "coly", "colz"]),
             min_size=1, max_size=6, unique=True)
)
def test_infer_doc_columns_total(cols):
    """Inference always returns columns that exist in the input."""
    i, t, x = infer_doc_columns(cols)
    assert i in cols and t in cols and x in cols


@given(st.text(max_size=120), st.text(max_size=120))
def test_hash_embedder_deterministic_and_unit(a, b):
    va, vb = _hash_embed_one(a, 16), _hash_embed_one(b, 16)
    assert va == _hash_embed_one(a, 16)            # deterministic
    na = sum(x * x for x in va)
    assert na == 0 or abs(na - 1.0) < 1e-9          # unit or zero
    if a == b:
        assert va == vb


# ---------------------------------------------------------------------------
# Spark-backed invariants — bounded examples
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.floats(0, 1, allow_nan=False)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.floats(0.01, 0.5),
    st.floats(0.0, 0.8),
)
def test_topk_margin_invariants(spark, rows, margin, floor):
    from backend_fastapi_spark.operators.relational import topk_margin

    df = spark.createDataFrame(rows, ["id", "sim"])
    got = topk_margin(df, "sim", k=5, margin=margin, floor=floor, tie_col="id").collect()
    sims = [r.sim for r in got]
    assert len(got) <= 5
    assert all(s >= floor for s in sims)
    if sims:
        best = max(t[1] for t in rows if t[1] >= floor)
        cut = max(best - margin, best * (1 - margin))
        assert all(s >= cut for s in sims)
        assert sims == sorted(sims, reverse=True)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 8), st.text("ab", min_size=1, max_size=3),
                  st.integers(0, 100)),
        min_size=1, max_size=20, unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(st.integers(1, 12), st.text("cd", min_size=1, max_size=3),
                  st.integers(0, 100)),
        min_size=0, max_size=10, unique_by=lambda t: t[0],
    ),
)
def test_upsert_properties(spark, base_rows, update_rows):
    from backend_fastapi_spark.operators.crud import upsert

    base = spark.createDataFrame(base_rows, ["k", "v", "ver"])
    ups = spark.createDataFrame(update_rows, ["k", "v", "ver"]) if update_rows \
        else spark.createDataFrame([], base.schema)
    merged = upsert(base, ups, ["k"], "ver")
    got = {r.k: (r.v, r.ver) for r in merged.collect()}
    # key-uniqueness and union coverage
    assert len(got) == len({k for k, *_ in base_rows} | {k for k, *_ in update_rows})
    # winner has the max version among candidates for its key
    cands: dict[int, list[tuple[str, int]]] = {}
    for k, v, ver in base_rows + update_rows:
        cands.setdefault(k, []).append((v, ver))
    for k, (v, ver) in got.items():
        assert ver == max(x[1] for x in cands[k])
    # idempotence: re-upserting the same updates changes nothing
    again = {r.k: (r.v, r.ver) for r in upsert(merged, ups, ["k"], "ver").collect()}
    assert again == got


# ---------------------------------------------------------------------------
# connected components vs a pure-Python union-find reference
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, raw_edges):
    from backend_fastapi_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in raw_edges if a != b]
    if not edges:
        return
    # reference: classic union-find over the same edges
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {v: find(v) for v in parent}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    # both execution paths must produce the identical labeling: the
    # bounded-collect union-find (default at this size) and the
    # distributed min-label loop (forced via driver_max_edges=0)
    got_driver = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    got_dist = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df, driver_max_edges=0).collect()
    }
    assert got_driver == expected
    assert got_dist == expected


# ---------------------------------------------------------------------------
# banded interval join vs brute force
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=2, max_size=40, unique=True),
    st.integers(1, 120),
)
def test_banded_interval_join_matches_bruteforce(spark, offsets, gap_s):
    import pandas as pd

    from backend_fastapi_spark.operators.rangejoin import banded_interval_join

    base = pd.Timestamp("2024-01-01")
    rows = [(i, base + pd.Timedelta(seconds=s)) for i, s in enumerate(offsets)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["event_id", "ts"]))
    got = {
        (r.event_id, r.id_b)
        for r in banded_interval_join(
            df.select("event_id", "ts"),
            df.select(df.event_id.alias("id_b"), df.ts.alias("ts_b")),
            "ts",
            "ts_b",
            gap_us=gap_s * 1_000_000,
        ).collect()
    }
    gap = pd.Timedelta(seconds=gap_s)
    expected = {
        (i, j)
        for i, ti in rows
        for j, tj in rows
        if tj > ti and tj <= ti + gap
    }
    assert got == expected


# ---------------------------------------------------------------------------
# round-5 oracle identities, pinned as properties (pure Python, no Spark)
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=30),
        min_size=1,
        max_size=400,
    )
)
def test_merge_chain_model_matches_recursive_split(words):
    """The recursive_chunk_merge_oracle's prefix-sum boundary chain must
    equal recursive_split on merge-only-regime text (single-space joined
    short words) — the identity its DuckDB oracle encodes. A chunker
    refactor that shifts any boundary must fail here before it reaches
    the driver as a hash mismatch."""
    from backend_fastapi_spark.operators.chunker import recursive_split

    t = " ".join(words)
    C, O = 700, 120

    plens = [len(words[0])] + [1 + len(w) for w in words[1:]]
    pfx = [0]
    for L in plens:
        pfx.append(pfx[-1] + L)
    tot = pfx[-1]
    chain, ps, k = [], 0, 0
    pe = max(p for p in pfx if p <= ps + C)
    while True:
        chain.append(t[:pe] if k == 0 else t[ps + 1:pe])
        if pe >= tot:
            break
        ps = min(p for p in pfx if p >= pe - O)
        pe = max(p for p in pfx if p <= ps + C)
        k += 1
    assert chain == recursive_split(t, C, O)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_rp_pairs_subset_of_exact_with_precision_one(spark, seed):
    """RP-LSH output ⊆ exact threshold pairs for arbitrary vectors: the
    verify step makes precision exactly 1 regardless of bucketing."""
    import numpy as np

    from backend_fastapi_spark.operators.lsh import rp_near_dup_pairs

    rng = np.random.default_rng(seed)
    M = rng.normal(size=(30, 64))
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    # plant a couple of duplicates so the subset check isn't vacuous
    M[1] = M[0]
    M[3] = M[2]
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(M)],
        ["vec_id", "embedding"],
    )
    thr = int(0.9 * 1e12)
    # Sign-aware half-UP quantization to match Spark's round() (HALF_UP);
    # np.round is banker's (half-even) and would diverge on exact-.5
    # components — measure-zero for random normals but a latent flake
    # under hypothesis seeds (ADVICE r05 #5).
    X = M * 1e6
    Q = (np.sign(X) * np.floor(np.abs(X) + 0.5)).astype(np.int64)
    S = Q @ Q.T
    iu = np.triu_indices(len(M), k=1)
    exact = {
        (int(a), int(b)): int(s)
        for a, b, s in zip(iu[0], iu[1], S[iu])
        if s >= thr
    }
    got = {(r.id_a, r.id_b): r.score_i64
           for r in rp_near_dup_pairs(df, threshold_i64=thr).collect()}
    assert set(got) <= set(exact)
    for pair, score in got.items():
        assert score == exact[pair]  # scores are the exact fixed-point dot
    # identical vectors always collide (every sign decision equal)
    assert (0, 1) in got and (2, 3) in got


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["plain words here", "x@y.org", "https://h.example/p q",
             "010-123-4567", "123-4567-8901", "a.b@c.d.co", "no pii at all"]
        ),
        min_size=1,
        max_size=6,
    )
)
def test_scrub_pii_matches_python_re_reference(spark, parts):
    """Engine parity for the PII scrubber: Spark regexp_replace (Java
    regex) must equal Python re.sub for the restricted pattern subset —
    the same compatibility claim the DuckDB oracle relies on (RE2). Also
    pins the invariant that a scrubbed text contains no residual
    matches."""
    import re

    from backend_fastapi_spark.operators.text import PII_PATTERNS, scrub_pii

    text = " ".join(parts)
    expected = text
    for kind, pat in PII_PATTERNS:
        expected = re.sub(pat, f"<{kind.upper()}>", expected)
    row = scrub_pii(spark.createDataFrame([(text,)], ["text"])).head()
    assert row.scrubbed == expected
    for kind, pat in PII_PATTERNS:
        assert not re.search(pat, row.scrubbed)
        assert getattr(row, f"n_{kind}") == len(re.findall(pat, text))


def test_asof_drops_null_time_and_null_key_rows(spark):
    """NULL right timestamps must not be carried as phantom matches and
    NULL keys must not meet in the window's NULL partition — SQL
    equality/inequality semantics."""
    import datetime

    from backend_fastapi_spark.operators.asof import asof_join

    t = lambda m: datetime.datetime(2024, 1, 1, 12, m)
    left = spark.createDataFrame(
        [(1, t(5)), (None, t(5))], "k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [(1, None, "phantom"), (None, t(3), "nullkey")],
        "k long, rt timestamp, payload string",
    )
    out = asof_join(left, right, "k", "lt", "rt", ["payload"]).collect()
    assert out == []  # no phantom NULL-time match, no NULL-key match


def test_ivf_deterministic_mixed_id_types_not_empty(spark):
    """String query ids vs int corpus ids: the self-exclusion filter
    must not coerce-to-NULL and drop every candidate."""
    import numpy as np

    from backend_fastapi_spark.operators.ivf import ivf_deterministic_topk

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [("q-0", [float(x) for x in vecs[0]])],
        "q_id string, q_embedding array<double>",
    )
    got = ivf_deterministic_topk(corpus, queries, k=5, k_clusters=4)
    assert got.count() == 5


def test_band_rows_must_divide_n_hashes(spark):
    import pytest

    from backend_fastapi_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], ["doc_id", "text"]
    )
    # band_rows > n_hashes would yield ZERO bands = gate disabled
    with pytest.raises(ValueError, match="divisor"):
        incremental_minhash_dedup(docs, docs, n_hashes=16, band_rows=20)
    # non-divisor would silently drop trailing signature columns
    with pytest.raises(ValueError, match="divisor"):
        minhash_lsh_pairs(docs, n_hashes=16, band_rows=5)


def test_incremental_gate_catches_sub_shingle_duplicates(spark):
    """Docs with < n words have no shingles; the exact-text fallback
    must still reject verbatim duplicates of corpus docs."""
    from backend_fastapi_spark.operators.dedup import incremental_minhash_dedup

    corpus = spark.createDataFrame(
        [(1, "click here"), (2, "w1 w2 w3 w4 w5 w6 w7 w8")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(100, "click here"),        # verbatim short dup -> reject
         (101, "buy now"),          # novel short doc -> accept
         (102, "w1 w2 w3 w4 w5 w6 w7 w8")],  # verbatim long dup -> reject
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.accepted
           for r in incremental_minhash_dedup(corpus, batch).collect()}
    assert got == {100: False, 101: True, 102: False}


def test_connected_components_raises_on_non_convergence(spark):
    import pytest

    from backend_fastapi_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2, driver_max_edges=0)


def test_connected_components_drops_null_endpoints(spark):
    from backend_fastapi_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None)], "id_a long, id_b long"
    )
    for kw in ({}, {"driver_max_edges": 0}):
        labels = {
            (r.id, r.cluster_id)
            for r in connected_components(edges, **kw).collect()
        }
        assert labels == {(1, 1), (2, 1)}  # null-edge vertices excluded


def test_scrub_pii_null_text_counts_zero(spark):
    from backend_fastapi_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "mail me: a@b.com"), (2, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert rows[1].n_email == 1
    assert rows[2].n_email == 0 and rows[2].n_url == 0 and rows[2].n_phone == 0
    assert rows[2].scrubbed is None


def test_near_dup_matmul_preserves_string_ids(spark):
    from backend_fastapi_spark.operators.vector import near_dup_pairs_matmul

    df = spark.createDataFrame(
        [("doc-a", "g1", [1.0, 0.0]), ("doc-b", "g1", [1.0, 0.0]),
         ("doc-c", "g1", [0.0, 1.0])],
        "vec_id string, grp string, embedding array<double>",
    )
    rows = near_dup_pairs_matmul(
        df, threshold_i64=900_000_000_000, block_col="grp"
    ).collect()
    assert {(r.id_a, r.id_b) for r in rows} == {("doc-a", "doc-b")}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=6),
                 min_size=3, max_size=8),
        min_size=2, max_size=5,
    )
)
def test_c4_span_dedup_accounting(spark, docs_lines):
    """Exact global accounting for span dedup: every span occurrence
    beyond its corpus-wide first is a dup (sum of n_dup_spans ==
    total occurrences − distinct spans), per-doc counters are
    conserved, and a corpus with all-distinct spans loses nothing."""
    from backend_fastapi_spark.operators.text import c4_span_dedup

    n = 3
    rows = [
        (i, "\n".join(f"line token {v}." for v in lines))
        for i, lines in enumerate(docs_lines)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in c4_span_dedup(df, n=n).collect()}
    assert set(out) == {i for i, _ in rows}
    # recompute the span universe exactly
    occurrences = []
    for i, (_, text) in enumerate(rows):
        lines = text.split("\n")
        for j in range(len(lines) - n + 1):
            occurrences.append(tuple(lines[j:j + n]))
    total_dups = len(occurrences) - len(set(occurrences))
    assert sum(r.n_dup_spans for r in out.values()) == total_dups
    for i, (_, text) in enumerate(rows):
        r = out[i]
        lines = text.split("\n")
        assert r.n_sents == len(lines)
        assert r.n_spans == max(len(lines) - n + 1, 0)
        assert 0 <= r.n_kept_sents <= r.n_sents
        kept = r.clean_text.split("\n") if r.clean_text else []
        assert len(kept) == r.n_kept_sents
        # kept lines are a subsequence of the originals
        it = iter(lines)
        assert all(any(k == x for x in it) for k in kept)
    if total_dups == 0:  # all-distinct corpus is untouched
        assert all(out[i].clean_text == rows[i][1] for i, _ in rows)


def _sq8_model(vec):
    """Pure-python model of vector.sq8_codes: half-away-from-zero rounds
    (Spark/DuckDB ROUND), 1e6 fixed-point, per-vector |max| scale."""
    import math

    def rnd(x):
        return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

    fx = [rnd(float(v) * 1_000_000) for v in vec]
    s = max((abs(x) for x in fx), default=0)
    if s == 0:
        return 0, [0] * len(fx)
    return s, [rnd(x * 127.0 / s) for x in fx]


@given(st.lists(st.floats(min_value=-1.0, max_value=1.0,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=32))
def test_sq8_model_invariants(vec):
    """Quantization invariants: codes bounded by ±127, at least one code
    hits the bound (scale = max |fx|), and per-component reconstruction
    error is at most half a quantization step (s/254 in fx units)."""
    s, codes = _sq8_model(vec)
    assert all(-127 <= c <= 127 for c in codes)
    import math

    fx = [int(math.floor(float(v) * 1e6 + 0.5)) if v >= 0
          else -int(math.floor(-float(v) * 1e6 + 0.5)) for v in vec]
    if s == 0:
        assert codes == [0] * len(vec)
        return
    assert max(abs(c) for c in codes) == 127
    for x, c in zip(fx, codes):
        assert abs(x - c * s / 127.0) <= s / 254.0 + 1e-9


@settings(max_examples=6, deadline=None)
@given(st.lists(st.lists(st.floats(min_value=-1.0, max_value=1.0,
                                   allow_nan=False, allow_infinity=False,
                                   width=32),
                         min_size=8, max_size=8),
                min_size=1, max_size=5))
def test_sq8_codes_match_python_model(spark, vecs):
    """Spark's codegen sq8_codes agrees with the pure-python model on
    arbitrary float32 vectors — the same engine-neutral-arithmetic
    contract the DuckDB oracle relies on."""
    from backend_fastapi_spark.operators.vector import sq8_codes

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: (int(r["scale_fx"]), [int(c) for c in r["code"]])
           for r in sq8_codes(df).collect()}
    import numpy as np

    for i, v in enumerate(vecs):
        # the engine quantizes the FLOAT32 value cast to double — mirror
        # that in the model input
        v32 = [float(np.float32(x)) for x in v]
        assert got[i] == _sq8_model(v32)
