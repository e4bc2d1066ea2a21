"""Training-corpus pipeline operators: splits, sampling, decontamination,
repetition quality, connected-components dup clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from backend_fastapi_spark.operators.dedup import connected_components
from backend_fastapi_spark.operators.pipeline import (
    repetition_metrics,
    split_assign,
    stratified_sample,
)
from tests.conftest import SF_ORACLE
from backend_fastapi_spark.sources.parquet import read_table


def test_connected_components_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, singleton edges only — vertex
    # set is edge-derived so isolated vertices don't appear.
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        (r["id"], r["cluster_id"])
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_long_chain_converges(spark):
    # A 12-vertex path needs ~diameter rounds; checks the DISTRIBUTED
    # fixpoint loop (driver_max_edges=0 disables the union-find
    # short-circuit so the Pregel-style path is what's exercised).
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    rows = connected_components(edges, driver_max_edges=0).collect()
    assert {r["cluster_id"] for r in rows} == {0}
    assert len(rows) == 13


def test_split_assign_deterministic_and_disjoint(spark):
    docs = read_table(spark, SF_ORACLE, "documents")
    a = split_assign(docs).select("doc_id", "split")
    counts = dict(
        a.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    assert set(counts) == {"train", "test"}
    # 2/16 of md5 space ≈ 12.5%; generous band for a 500-doc sample
    frac = counts["test"] / (counts["test"] + counts["train"])
    assert 0.05 < frac < 0.25
    # identical on re-evaluation (no RNG state)
    b = split_assign(docs).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0


def test_stratified_sample_per_group_cap(spark):
    docs = read_table(spark, SF_ORACLE, "documents")
    s = stratified_sample(docs, "lang", 7)
    per = s.groupBy("lang").count().collect()
    assert all(r["count"] <= 7 for r in per)
    # ranks are 1..k dense per stratum
    assert s.filter(F.col("sample_rank") > 7).count() == 0


def test_repetition_metrics_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z w")], ["doc_id", "text"]
    )
    m = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert m[1]["n_words"] == 4
    assert abs(m[1]["top_word_frac"] - 0.75) < 1e-12  # 'a' 3/4
    assert abs(m[1]["top_bigram_frac"] - 2 / 3) < 1e-12  # 'a a' 2/3
    assert abs(m[1]["distinct_ratio"] - 0.5) < 1e-12
    assert abs(m[2]["distinct_ratio"] - 1.0) < 1e-12
    assert abs(m[2]["top_word_frac"] - 0.25) < 1e-12
    assert abs(m[1]["mean_word_len"] - 1.0) < 1e-12


def test_decontaminate_flags_planted_overlap(spark):
    # doc 6 (md5('6')[0]='1' → test) shares a 3-gram with doc 3 (train);
    # doc 32 (train) is disjoint from everything.
    from backend_fastapi_spark.operators.dedup import shingle_table

    df = spark.createDataFrame(
        [
            (3, "alpha beta gamma delta"),
            (6, "zz alpha beta gamma yy"),
            (32, "one two three four five"),
        ],
        ["doc_id", "text"],
    )
    docs = split_assign(df)
    splits = {r["doc_id"]: r["split"] for r in docs.collect()}
    assert splits == {3: "train", 6: "test", 32: "train"}
    sh = shingle_table(docs).join(docs.select("doc_id", "split"), "doc_id")
    train_sh = sh.filter(F.col("split") == "train").select("shingle").distinct()
    shared = (
        sh.filter(F.col("split") == "test")
        .join(train_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n"))
        .collect()
    )
    # shared 3-gram: "alpha beta gamma" only
    assert {(r["doc_id"], r["n"]) for r in shared} == {(6, 1)}


def test_ensure_parallelism_guard(spark):
    from backend_fastapi_spark.operators.util import ensure_parallelism
    from backend_fastapi_spark.sources.parquet import read_table

    target = spark.sparkContext.defaultParallelism
    narrow = read_table(spark, SF_ORACLE, "documents")  # single small file
    assert narrow.rdd.getNumPartitions() < target
    widened = ensure_parallelism(narrow, "doc_id")
    assert widened.rdd.getNumPartitions() == target
    # already-wide inputs pass through untouched (no added shuffle)
    wide = spark.range(0, 1000, 1, target + 4)
    assert ensure_parallelism(wide) is wide


def test_approx_sketch_stats_bounds(spark):
    from backend_fastapi_spark import queries as Q
    from pyspark.sql import functions as F
    from backend_fastapi_spark.sources.parquet import read_table

    approx = {
        r["event_type"]: r
        for r in Q.REGISTRY["approx_sketch_stats"].fn(spark, SF_ORACLE).collect()
    }
    ev = read_table(spark, SF_ORACLE, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, r in approx.items():
        assert abs(r["approx_users"] - exact[et]["users"]) <= 0.05 * exact[et]["users"]
        # GK sketch default accuracy: within a few percent of the exact median
        assert abs(r["value_p50"] - exact[et]["p50"]) <= max(
            0.1 * abs(exact[et]["p50"]), 1e-6
        )
        assert r["value_p50"] <= r["value_p99"]


def test_banded_interval_join_matches_naive(spark):
    import pandas as pd

    from backend_fastapi_spark.operators.rangejoin import banded_interval_join

    base = pd.Timestamp("2024-01-01 00:00:00")
    ts = pd.Series(
        [
            base,
            base + pd.Timedelta(seconds=30),  # 30s after e0
            base + pd.Timedelta(seconds=60),  # exactly 60s after e0 (inclusive)
            base + pd.Timedelta(seconds=60, microseconds=1),  # excluded from e0
            base + pd.Timedelta(hours=2),
        ]
    )
    df = spark.createDataFrame(pd.DataFrame({"event_id": range(5), "ts": ts}))
    left = df.select("event_id", "ts")
    right = df.select(
        df.event_id.alias("id_b"), df.ts.alias("ts_b")
    )
    got = {
        (r.event_id, r.id_b)
        for r in banded_interval_join(
            left, right, "ts", "ts_b", gap_us=60_000_000
        ).collect()
    }
    # naive reference over the same window
    import itertools

    rows = list(enumerate(ts))
    expected = {
        (i, j)
        for (i, ti), (j, tj) in itertools.product(rows, rows)
        if tj > ti and (tj - ti).value // 1000 <= 60_000_000 * 1000 // 1000
        and (tj - ti) <= pd.Timedelta(seconds=60)
    }
    assert got == expected
    assert (0, 2) in got and (0, 3) not in got  # boundary inclusive/exclusive


def test_pack_pretrain_boundaries(spark):
    """Docs spanning a 2048-token boundary get the straddling seq_id and
    in-sequence offset."""
    import pandas as pd

    from backend_fastapi_spark import queries as Q
    from backend_fastapi_spark.sources.parquet import read_table

    out = Q.REGISTRY["pack_pretrain_sequences"].fn(spark, SF_ORACLE).toPandas()
    # invariants: offsets within [0, 2048); seq ids dense-nonnegative per
    # bucket; cumulative reconstruction matches
    assert ((out.seq_offset >= 0) & (out.seq_offset < 2048)).all()
    assert (out.seq_id >= 0).all()
    for _, grp in out.sort_values("doc_id").groupby("bucket"):
        cum = 0
        for r in grp.itertuples(index=False):
            assert r.seq_id == cum // 2048
            assert r.seq_offset == cum % 2048
            cum += r.n_tokens


def test_weighted_sample_is_subset_and_deterministic(spark):
    from backend_fastapi_spark import queries as Q

    a = Q.REGISTRY["weighted_sample_docs"].fn(spark, SF_ORACLE).toPandas()
    b = Q.REGISTRY["weighted_sample_docs"].fn(spark, SF_ORACLE).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)  # no RNG state
    assert (a.u < a.w).all()  # kept iff uniform under weight


def test_temperature_sample_rebalances_head(spark):
    """alpha=0.5 quotas: the head group's sample share must sit between
    its sqrt-flattened share and its raw share, low-resource groups gain
    share, total ~ N/2, and no group is upsampled past its size."""
    from backend_fastapi_spark.operators.pipeline import temperature_sample

    rows = [(i, "en" if i < 600 else ("fr" if i < 700 else "sw"))
            for i in range(750)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    got = temperature_sample(df, "lang").groupBy("lang").count().collect()
    n = {r.lang: r["count"] for r in got}
    total = sum(n.values())
    # <= N/2 minus floor losses and the sw cap (quota 63 capped to 50)
    assert total <= 375
    sizes = {"en": 600, "fr": 100, "sw": 50}
    # exact integer quotas: (375 * w) // W with w = round(sqrt(n)*1e6)
    w = {g: round((s ** 0.5) * 1e6) for g, s in sizes.items()}
    W = sum(w.values())
    for g, s in sizes.items():
        assert n[g] == min(s, 375 * w[g] // W)
    # head share damped below raw share; tail share lifted above raw
    assert n["en"] / total < 600 / 750
    assert n["sw"] / total > 50 / 750


def test_incremental_dedup_gate(spark):
    """Batch-vs-corpus MinHash gate: verbatim re-ingests collide with
    exactly their source doc; genuinely novel docs pass; output covers
    every batch doc exactly once."""
    from backend_fastapi_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    # doc-unique vocabularies: no cross-doc shingles, so the ONLY
    # collisions are the planted verbatim copies
    corpus_rows = [
        (i, " ".join(f"d{i}w{j}" for j in range(30)))
        for i in range(20)
    ]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    batch = spark.createDataFrame(
        [
            # verbatim copies of docs 3 and 8 -> must collide
            (103, corpus_rows[3][1]),
            (108, corpus_rows[8][1]),
            # novel vocabulary -> must be accepted
            (200, " ".join(f"z{j}" for j in range(30))),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in
           incremental_minhash_dedup(corpus, batch).collect()}
    assert set(got) == {103, 108, 200}
    assert not got[103].accepted and got[103].first_match == 3
    assert not got[108].accepted and got[108].first_match == 8
    assert got[200].accepted and got[200].n_matches == 0


def test_repetition_metrics_emits_row_per_doc_even_degenerate(spark):
    """NULL/empty text must yield a degenerate metrics row (n_words=0),
    never silently vanish from the output."""
    from backend_fastapi_spark.operators.pipeline import repetition_metrics

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_metrics(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3].n_words == 0 and rows[3].top_word_frac == 0.0


def test_split_assign_rejects_non_hex_prefixes(spark):
    import pytest

    from backend_fastapi_spark.operators.pipeline import split_assign

    df = spark.createDataFrame([(1,)], ["doc_id"])
    # uppercase normalizes instead of silently matching nothing
    out = split_assign(df, test_prefixes=tuple("0123456789ABCDEF"))
    assert out.collect()[0].split == "test"
    with pytest.raises(ValueError, match="non-hex"):
        split_assign(df, test_prefixes=("g",))


def test_temperature_sample_excludes_null_groups_from_universe(spark):
    """NULL-group rows must not inflate n_total/w_total (they can never
    be sampled): with 50% NULL rows the output must still be ~N_real/2
    of the REAL universe, not shrunk by phantom mass."""
    from backend_fastapi_spark.operators.pipeline import temperature_sample

    rows = [(i, "ko" if i % 2 == 0 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = temperature_sample(df, "lang")
    # universe = the 100 'ko' rows; quota = (100 DIV 2) * w / w = 50
    assert got.count() == 50
    assert all(r.lang == "ko" for r in got.collect())


def test_quality_classifier_separates_gopher_labels(spark):
    """The GPT-3-recipe quality scorer (weak labels from the Gopher
    gate). Trained where vocabulary carries the signal — boilerplate
    docs are repetitive AND use boilerplate tokens, the shape the
    classifier exists to learn — it must rank good docs above bad with
    high AUC; on the real word-soup corpus (labels driven by ratios a
    bag-of-words linear model can only partly express) it must still
    emit one calibrated row per doc with the right ordering."""
    import itertools

    from backend_fastapi_spark.operators.pipeline import (
        quality_classifier_scores,
    )
    from tests.conftest import SF_SMOKE

    # Vocabulary-signal corpus: diverse prose passes the Gopher gate,
    # repeated boilerplate fails it (and betrays itself lexically).
    good_vocab = [f"word{i}" for i in range(40)]
    rows = []
    for d in range(120):
        if d % 2 == 0:
            toks = [good_vocab[(d + j) % 40] for j in range(30)]
        else:
            toks = [f"buy{d % 7}"] * 30  # top_word_frac = 1.0
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    scored = quality_classifier_scores(df).collect()
    assert len(scored) == 120
    assert all(0.0 <= r.p_good <= 1.0 for r in scored)
    good = [r.p_good for r in scored if r.label == 1]
    bad = [r.p_good for r in scored if r.label == 0]
    assert len(good) == 60 and len(bad) == 60
    wins = sum(
        (g > b) + 0.5 * (g == b) for g, b in itertools.product(good, bad)
    )
    assert wins / (len(good) * len(bad)) >= 0.95

    # Real corpus: one row per doc, and the ordering still holds even
    # though ratio-driven labels are only partly linearly expressible.
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    scored = quality_classifier_scores(docs).collect()
    assert len(scored) == docs.count()
    good = [r.p_good for r in scored if r.label == 1]
    bad = [r.p_good for r in scored if r.label == 0]
    assert good and bad
    assert sum(good) / len(good) > sum(bad) / len(bad)


def test_nb_twin_agrees_with_lr_ranking(spark):
    """VERDICT r12 directive #2: the deterministic NB scorer is the
    hash-evidence twin of the MLlib-LR quality classifier — same hashed
    features, same Gopher weak labels — so its RANKING must carry the
    same signal. On the vocabulary-signal corpus both must separate
    good from bad with AUC ≥ 0.95, and the two models must agree on
    ≥ 90% of (good, bad) orderings; on the real corpus NB must keep one
    row per doc (token-less docs at score 0, never dropped) and rank
    label-1 docs above label-0 on average, like the LR path."""
    import itertools

    from backend_fastapi_spark.operators.pipeline import (
        nb_quality_scores,
        quality_classifier_scores,
    )
    from tests.conftest import SF_SMOKE

    good_vocab = [f"word{i}" for i in range(40)]
    rows = []
    for d in range(120):
        if d % 2 == 0:
            toks = [good_vocab[(d + j) % 40] for j in range(30)]
        else:
            toks = [f"buy{d % 7}"] * 30
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    nb = {r.doc_id: r for r in nb_quality_scores(df).collect()}
    lr = {r.doc_id: r for r in quality_classifier_scores(df).collect()}
    assert len(nb) == 120 and len(lr) == 120
    assert all(nb[d].label == lr[d].label for d in nb)

    good = [d for d in nb if nb[d].label == 1]
    bad = [d for d in nb if nb[d].label == 0]
    pairs = list(itertools.product(good, bad))
    nb_wins = sum(
        (nb[g].score_fp > nb[b].score_fp)
        + 0.5 * (nb[g].score_fp == nb[b].score_fp)
        for g, b in pairs
    )
    assert nb_wins / len(pairs) >= 0.95  # NB separates like LR
    agree = sum(
        ((nb[g].score_fp > nb[b].score_fp) == (lr[g].p_good > lr[b].p_good))
        for g, b in pairs
    )
    assert agree / len(pairs) >= 0.90  # the twins order pairs alike

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    scored = nb_quality_scores(docs).collect()
    assert len(scored) == docs.count()
    g = [r.score_fp for r in scored if r.label == 1]
    b = [r.score_fp for r in scored if r.label == 0]
    assert g and b
    assert sum(g) / len(g) > sum(b) / len(b)


def test_dsir_weights_favor_target_domain(spark):
    """DSIR sanity: the mean importance weight of target-domain ('en')
    docs must exceed the non-target mean — the target slice defines the
    numerator multinomial, so its own docs are on average the most
    target-like. Also: top_k=None covers every tokenizable doc, and the
    top-k head is deterministic under repartitioning."""
    from backend_fastapi_spark.operators.pipeline import dsir_weights

    docs = read_table(spark, SF_ORACLE, "documents")
    allw = dsir_weights(docs, top_k=None)
    rows = allw.collect()
    assert len(rows) == docs.count()  # every doc has >=1 ASCII token here
    en = [r["score_fp"] / r["n_toks"] for r in rows if r["lang"] == "en"]
    other = [r["score_fp"] / r["n_toks"] for r in rows if r["lang"] != "en"]
    assert sum(en) / len(en) > sum(other) / len(other)

    head = [r["doc_id"] for r in dsir_weights(docs, top_k=20).collect()]
    head_rp = [
        r["doc_id"]
        for r in dsir_weights(docs.repartition(13), top_k=20).collect()
    ]
    assert head == head_rp and len(head) == 20


def test_ccnet_ppl_buckets_tiers_are_ordered_and_cover(spark):
    """CCNet tiers: (a) every doc assigned exactly once; (b) the tiers
    are ORDERED in cross-entropy (bins are ce-ordered and thresholds are
    bin boundaries, so head.max_ce <= middle.min_ce <= middle.max_ce <=
    tail.min_ce — equal-ce docs share a bin and can never straddle);
    (c) tier sizes are thirds up to bin granularity; (d) the assignment
    is partitioning-invariant."""
    from backend_fastapi_spark.operators.pipeline import ccnet_ppl_buckets

    docs = read_table(spark, SF_ORACLE, "documents")
    n = docs.count()
    rows = ccnet_ppl_buckets(docs).collect()
    assert len(rows) == n
    by = {}
    for r in rows:
        by.setdefault(r["ppl_bucket"], []).append(r["ce_tok_fp"])
    assert set(by) == {"head", "middle", "tail"}
    scored_tail = [v for v in by["tail"] if v is not None]
    assert max(by["head"]) <= min(by["middle"])
    assert max(by["middle"]) <= min(scored_tail)
    for tier in ("head", "middle", "tail"):
        assert n / 3 - 60 <= len(by[tier]) <= n / 3 + 60, tier

    again = ccnet_ppl_buckets(docs.repartition(13)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ccnet_ppl_buckets_tokenless_doc_goes_to_tail(spark):
    from backend_fastapi_spark.operators.pipeline import ccnet_ppl_buckets

    docs = spark.createDataFrame(
        [
            (0, "en", "the quick brown fox jumps over the lazy dog"),
            (1, "en", "the quick brown fox"),
            (2, "en", "zzz qqq xxx vvv kkk jjj"),
            (3, "ko", "안녕하세요"),  # no ASCII tokens
            (4, "en", "the the the the"),
            (5, "en", "lazy dog jumps"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {r["doc_id"]: r for r in ccnet_ppl_buckets(docs).collect()}
    assert len(out) == 6
    r3 = out[3]
    assert (r3["ppl_bucket"], r3["n_toks"], r3["ce_tok_fp"]) == ("tail", 0, None)
    # reference-slice-typical tokens score LOWER cross-entropy than
    # tokens the reference slice never emits
    assert out[0]["ce_tok_fp"] < out[2]["ce_tok_fp"]


def test_training_shards_roundtrip_manifest(spark, tmp_path):
    """write_training_shards -> read back -> manifest identical to the
    source manifest; every shard directory present; assignment stable."""
    from backend_fastapi_spark.operators.pipeline import (
        assign_training_shards,
        shard_manifest,
        write_training_shards,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    n_shards = 8
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=n_shards)

    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == [f"shard={k}" for k in range(n_shards)]

    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    src_m = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["n_bytes"], r["content_sum"])
        for r in shard_manifest(docs, n_shards=n_shards).collect()
    }
    # the written files carry the shard in the directory key; recompute the
    # manifest from the payloads alone and compare
    got_m = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["n_bytes"], r["content_sum"])
        for r in shard_manifest(
            back.drop("shard"), n_shards=n_shards
        ).collect()
    }
    assert got_m == src_m

    # assignment is rerun-stable (pure hash, no RNG state)
    a1 = assign_training_shards(docs, n_shards).select("doc_id", "shard")
    a2 = assign_training_shards(docs, n_shards).select("doc_id", "shard")
    assert a1.exceptAll(a2).count() == 0

    # hash-uniform balance: no shard more than 2x the ideal share
    ideal = docs.count() / n_shards
    assert all(v[0] < 2 * ideal for v in src_m.values())


def test_training_shards_mode_and_bounds_guards(spark, tmp_path):
    from backend_fastapi_spark.operators.pipeline import (
        assign_training_shards,
        write_training_shards,
    )
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="n_shards"):
        assign_training_shards(docs, 0)
    with _pytest.raises(ValueError, match="mode"):
        write_training_shards(docs, str(tmp_path / "x"), mode="append")
    # intra-shard order is deterministic: shard column range-checked
    got = assign_training_shards(docs, 4).select("shard").collect()
    assert all(0 <= r["shard"] < 4 for r in got)


def test_append_training_shards_idempotent_and_merge_law(spark, tmp_path):
    """Two appended batches + a crash-retry of the second == the union:
    same shard membership as a one-shot export, and the per-shard
    manifest of the export equals the manifest computed on the union
    (the commutative-checksum merge law)."""
    from backend_fastapi_spark.operators.pipeline import (
        append_training_shards,
        read_training_shards,
        shard_manifest,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    out = str(tmp_path / "export")

    append_training_shards(b1, out, "0001", n_shards=4)
    append_training_shards(b2, out, "0002", n_shards=4)
    # crash-retry: same token rewrites only its own batch dir
    append_training_shards(b2, out, "0002", n_shards=4)

    back = read_training_shards(spark, out)
    assert back.count() == docs.count()
    assert sorted(
        r["batch"] for r in back.select("batch").distinct().collect()
    ) == [1, 2]

    m_export = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["n_bytes"], r["content_sum"])
        for r in shard_manifest(
            back.drop("shard", "batch"), n_shards=4
        ).collect()
    }
    m_union = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["n_bytes"], r["content_sum"])
        for r in shard_manifest(docs, n_shards=4).collect()
    }
    assert m_export == m_union

    # shard membership matches the one-shot writer's assignment
    from backend_fastapi_spark.operators.pipeline import assign_training_shards

    one_shot = {
        r["doc_id"]: r["shard"]
        for r in assign_training_shards(docs, 4).select("doc_id", "shard").collect()
    }
    appended = {r["doc_id"]: r["shard"] for r in back.select("doc_id", "shard").collect()}
    assert appended == one_shot

    import pytest as _pytest

    with _pytest.raises(ValueError, match="batch_token"):
        append_training_shards(b1, out, "bad/token", n_shards=4)


def test_mixture_plan_invariants(spark):
    """The plan's accounting holds: allocations never exceed the budget,
    every domain obeys the epoch cap, shares sum to ~1e6 ppm, the big
    domain's share is damped below its raw token share (sqrt
    temperature), and guards raise."""
    import pytest as _pytest

    from backend_fastapi_spark.operators.pipeline import mixture_plan

    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    plan = {r["lang"]: r.asDict() for r in mixture_plan(
        docs, token_budget=2_000_000, max_epochs=3).collect()}

    total_tokens = sum(r["n_tokens"] for r in plan.values())
    assert sum(r["capped_alloc_tokens"] for r in plan.values()) <= 2_000_000
    assert sum(r["alloc_tokens"] for r in plan.values()) <= 2_000_000
    assert 999_000 <= sum(r["share_ppm"] for r in plan.values()) <= 1_000_000
    for r in plan.values():
        assert r["capped_alloc_tokens"] <= 3 * r["n_tokens"]
        assert r["epochs_ppm"] <= 3_000_000
        # sqrt damping: share vs raw token share — bigger-than-average
        # domains get LESS than proportional, smaller get MORE
        raw_ppm = r["n_tokens"] * 1_000_000 // total_tokens
        if raw_ppm > 1_000_000 // len(plan):
            assert r["share_ppm"] < raw_ppm
        else:
            assert r["share_ppm"] >= raw_ppm

    with _pytest.raises(ValueError, match="token_budget"):
        mixture_plan(docs, token_budget=0)
    with _pytest.raises(ValueError, match="max_epochs"):
        mixture_plan(docs, token_budget=10, max_epochs=0)
