"""Scalar-function tests: Korean particle / NFKC UDFs, sentence split,
relational operator edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from backend_fastapi_spark.functions.korean import (
    has_final_consonant,
    nfkc_one,
    nfkc_udf,
    topic_particle,
    with_topic_particle,
)
from backend_fastapi_spark.operators import relational as R


def test_topic_particle_pure():
    # 받침 present → 은; absent → 는 (reference enhanced:865-874)
    assert topic_particle("메커니즘") == "은"
    assert topic_particle("어텐션") == "은"
    assert topic_particle("데이터") == "는"
    assert topic_particle("스파크") == "는"
    assert topic_particle("rag") == "는"  # non-Hangul → 는
    assert topic_particle("") == "는"
    assert has_final_consonant("합") and not has_final_consonant("하")


def test_nfkc_pure():
    assert nfkc_one("ﬁle") == "file"          # ligature
    assert nfkc_one("①２３") == "123"          # circled/fullwidth digits
    assert nfkc_one("ＡＢＣ") == "ABC"          # fullwidth latin
    assert nfkc_one(None) is None


def test_korean_udfs_on_dataframe(spark):
    df = spark.createDataFrame(
        [("어텐션 메커니즘",), ("스파크",), ("ﬁｌｅ①",)], ["term"]
    )
    got = df.select(
        with_topic_particle(F.col("term")).alias("with_particle"),
        nfkc_udf(F.col("term")).alias("norm"),
    ).collect()
    assert got[0].with_particle == "어텐션 메커니즘은"
    assert got[1].with_particle == "스파크는"
    assert got[2].norm == "file1"


def test_sentence_split_two_sentence_guarantee(spark):
    """§2.8 sentence split with 2-sentence fallback (enhanced:581-589):
    split on terminal punctuation; if < 2 sentences, keep whole text."""
    df = spark.createDataFrame(
        [(1, "First one. Second here! Third?"), (2, "no terminal punct at all")],
        ["id", "txt"],
    )
    sents = F.filter(
        F.split(F.col("txt"), "(?<=[.!?。])\\s+"), lambda s: F.length(s) > 0
    )
    out = df.select(
        "id",
        F.when(F.size(sents) >= 2, F.slice(sents, 1, 2))
        .otherwise(F.array(F.col("txt")))
        .alias("first_two"),
    ).collect()
    by_id = {r.id: r.first_two for r in out}
    assert by_id[1] == ["First one.", "Second here!"]
    assert by_id[2] == ["no terminal punct at all"]


def test_json_array_extraction_from_llm_text(spark):
    """§2.8: pull a JSON array out of surrounding LLM prose
    (routes.py:2260-2274 regex `\\[\\s*\\{.*?\\}\\s*\\]` + parse) via
    regexp_extract + from_json with an explicit schema."""
    df = spark.createDataFrame(
        [
            (1, 'Here are results: [ {"name": "a", "score": 1}, {"name": "b", "score": 2} ] hope that helps'),
            (2, "no json here"),
        ],
        ["id", "llm_text"],
    )
    arr_str = F.regexp_extract("llm_text", r"\[\s*\{.*?\}\s*\]", 0)
    parsed = F.from_json(arr_str, "array<struct<name:string,score:int>>")
    out = {r.id: r.items for r in df.select("id", parsed.alias("items")).collect()}
    assert [x.asDict() for x in out[1]] == [
        {"name": "a", "score": 1},
        {"name": "b", "score": 2},
    ]
    assert out[2] is None


def test_sentence_repunctuate_batch(spark):
    """§2.8 batch sentence split + re-punctuate
    (streaming_tts_service.py:259-274): split on terminals, re-append the
    terminal, drop empties."""
    df = spark.createDataFrame([(1, "One. Two! Three? tail",)], ["id", "txt"])
    # capture sentence+terminal pairs directly
    sents = F.expr(r"regexp_extract_all(txt, '[^.!?。]+[.!?。]', 0)")
    out = df.select(F.transform(sents, lambda s: F.trim(s)).alias("sents")).head()
    assert out.sents == ["One.", "Two!", "Three?"]


def test_topk_margin_edges(spark):
    df = spark.createDataFrame(
        [(1, 0.9), (2, 0.85), (3, 0.5), (4, 0.3), (5, 0.89)], ["id", "sim"]
    )
    # floor removes 0.3; margin 0.1 keeps >= max(0.8, 0.81) = 0.81
    got = R.topk_margin(df, "sim", k=10, margin=0.1, floor=0.4, tie_col="id")
    assert sorted(r.id for r in got.collect()) == [1, 2, 5]
    # empty input stays empty
    assert R.topk_margin(df.filter("sim > 2"), "sim", 5, 0.1, 0.4, "id").count() == 0


def test_diversify_round_robin_order(spark):
    rows = [
        ("a", 1, 0.9), ("a", 2, 0.8), ("a", 3, 0.7),
        ("b", 4, 0.95), ("b", 5, 0.6),
        ("c", 6, 0.5),
    ]
    df = spark.createDataFrame(rows, ["grp", "id", "sim"])
    got = R.diversify_round_robin(
        df, group_col="grp", score_col="sim", per_group_cap=2, top_k=5, tie_col="id"
    ).collect()
    # round 1: best of each group by sim desc (b .95, a .9, c .5),
    # round 2: second of each group (a .8, b .6)
    assert [r.id for r in got] == [4, 1, 6, 2, 5]


def test_scrub_pii_redacts_and_counts(spark):
    rows = [
        (1, "mail me at alice.smith+x@corp.example.org today"),
        (2, "docs at https://a.example.com/x?q=1 and http://b.io/y"),
        (3, "call 010-1234-5678 or 02-555-1234 maybe"),  # 2nd: 2-digit area, no match
        (4, "plain text, nothing to scrub"),
        (5, "https://e.com/u?m=bob@x.io mixed"),  # email inside URL: URL wins
    ]
    from backend_fastapi_spark.operators.text import scrub_pii

    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r.id: r for r in scrub_pii(df).collect()}
    assert got[1].scrubbed == "mail me at <EMAIL> today"
    assert (got[1].n_email, got[1].n_url, got[1].n_phone) == (1, 0, 0)
    assert got[2].scrubbed == "docs at <URL> and <URL>"
    assert got[2].n_url == 2
    assert got[3].scrubbed == "call <PHONE> or 02-555-1234 maybe"
    assert got[3].n_phone == 1
    assert got[4].scrubbed == got[4].text and got[4].n_email == 0
    # URL scrubbed first, so the embedded email never survives to match
    assert got[5].scrubbed == "<URL> mixed"


def test_winnow_guarantee_and_density(spark):
    # Winnowing contract (Schleimer et al. 2003): two docs sharing a
    # substring of length >= k + w - 1 share at least one fingerprint,
    # and each fingerprint covers at most w windows (density bound).
    from backend_fastapi_spark.operators.text import kgram_hashes, winnow_fingerprints

    k, w = 20, 12
    shared = "the quick brown fox jumps over the lazy dog near the river"  # 59 >= 31
    rows = [
        (1, "prefix alpha " + shared + " suffix beta gamma"),
        (2, "totally different opening text " + shared + " and another tail"),
        (3, "no overlap here at all just unrelated filler words and numbers 123"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id", kgram_hashes(F.col("text"), k).alias("hs")
        )
        .select(
            "doc_id",
            F.size("hs").alias("n_kgrams"),
            winnow_fingerprints(F.col("hs"), w).alias("fps"),
        )
        .collect()
    }
    fps1, fps2, fps3 = (set(got[i].fps) for i in (1, 2, 3))
    assert fps1 & fps2, "docs sharing a >=k+w-1 substring must share a fingerprint"
    assert not (fps1 & fps3) and not (fps2 & fps3)
    for r in got.values():
        n_windows = r.n_kgrams - (w - 1)
        assert len(r.fps) * w >= n_windows  # each fp covers <= w windows
        assert len(r.fps) <= n_windows


def test_winnow_arrow_table_matches_expression_form(spark):
    """The Arrow-batched winnowing substrate (r7 constant-factor port)
    must equal the expression form doc-for-doc — n_kgrams AND the exact
    fingerprint list (order included: pd.unique and array_distinct both
    keep first occurrence). Includes non-ASCII (codepoint-slicing
    fallback) and a length-boundary doc."""
    from backend_fastapi_spark.operators.text import (
        kgram_hashes,
        winnow_fingerprints,
        winnow_fingerprint_table,
    )

    k, w = 20, 12
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "한국어 텍스트가 섞인 문서입니다 winnowing은 코드포인트 기준으로 동작해야 합니다"),
        (3, "x" * (k + w - 1)),          # exactly the minimum length
        (4, "too short"),                # filtered out by both paths
        (5, "MiXeD CaSe TeXt SO THE LOWERING PATH IS EXERCISED TOO ok"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    base = df.filter(
        F.length(F.lower(F.col("text"))) >= k + w - 1
    ).select("doc_id", F.lower(F.col("text")).alias("tx"))
    want = {
        r.doc_id: (r.n_kgrams, list(r.fps))
        for r in base.select(
            "doc_id", kgram_hashes(F.col("tx"), k).alias("hs")
        )
        .select(
            "doc_id",
            F.size("hs").cast("long").alias("n_kgrams"),
            winnow_fingerprints(F.col("hs"), w).alias("fps"),
        )
        .collect()
    }
    got = {
        r.doc_id: (r.n_kgrams, list(r.fps))
        for r in winnow_fingerprint_table(df, k, w).collect()
    }
    assert set(got) == {1, 2, 3, 5}
    assert got == want


def test_c4_line_filter_rules(spark):
    """Each C4 rule branch on crafted pages: line-level terminal
    punctuation / min-words / javascript, page-level lorem-ipsum /
    brace / min-kept-lines, and the cleaned reassembly."""
    from backend_fastapi_spark.operators.text import c4_line_filter

    rows = [
        (1, "Good first sentence.\nAnother fine line here.\n"
            "Third one stays too.\nfourth has no terminal mark"),
        (2, "Good first sentence.\nno terminal punctuation\n"
            "Enable JavaScript to continue.\ntoo short.\nFine ending line."),
        (3, "Lorem Ipsum dolor sit amet.\nGood line one.\n"
            "Good line two.\nGood line three.\nGood line four."),
        (4, "Good line one stays.\nvar x = { nope }\nGood line two stays.\n"
            "Good line three stays.\nGood line four stays."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in
           c4_line_filter(df, min_kept_lines=3).collect()}
    # doc 1: 4 lines, 3 end in '.', last one doesn't -> 3 kept, page kept
    assert (got[1].n_lines, got[1].n_kept_lines, got[1].doc_kept) == (4, 3, 1)
    assert got[1].clean_text == (
        "Good first sentence.\nAnother fine line here.\nThird one stays too."
    )
    # doc 2: only 2 survive the line rules -> below min_kept_lines
    assert (got[2].n_kept_lines, got[2].doc_kept) == (2, 0)
    assert got[2].clean_text is None
    # doc 3: lorem ipsum kills the page even with 5 keepable lines
    assert (got[3].n_kept_lines, got[3].doc_kept) == (5, 0)
    # doc 4: a single brace kills the page
    assert got[4].doc_kept == 0
    # NULL text: one empty line, zero kept, dropped — counters non-NULL
    null_row = c4_line_filter(
        spark.createDataFrame([(9, None)], "doc_id long, text string")
    ).head()
    assert (null_row.n_lines, null_row.n_kept_lines,
            null_row.doc_kept, null_row.clean_text) == (1, 0, 0, None)
    # Whitespace-word semantics: consecutive spaces are ONE separator
    # ("Too  short." is 2 words, not 3 — dropped) and tabs DO split
    # ("Tab\tsplit\twords." is 3 words — kept).
    ws = {r.doc_id: r for r in c4_line_filter(
        spark.createDataFrame(
            [(10, "Too  short."), (11, "Tab\tsplit\twords.")],
            ["doc_id", "text"],
        ),
        min_kept_lines=1,
    ).collect()}
    assert (ws[10].n_kept_lines, ws[10].doc_kept) == (0, 0)
    assert (ws[11].n_kept_lines, ws[11].doc_kept) == (1, 1)


def test_c4_span_dedup_first_occurrence_survives(spark):
    """Cross-doc 3-sentence-span dedup: the (doc_id, pos)-first
    occurrence keeps its lines; every later occurrence loses exactly
    the covered lines; docs shorter than the span are untouched."""
    from backend_fastapi_spark.operators.text import c4_span_dedup

    a = "A1.\nA2.\nA3.\nA4."              # spans (A1A2A3), (A2A3A4)
    b = "B0.\nA1.\nA2.\nA3.\nB5."          # repeats span (A1A2A3) at pos 1
    c = "tiny.\npage."                     # < 3 lines: no spans
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in c4_span_dedup(df, n=3).collect()}
    # doc 1 is first everywhere: nothing removed
    assert (got[1].n_spans, got[1].n_dup_spans) == (2, 0)
    assert got[1].clean_text == a
    # doc 2: its (A1,A2,A3) span is a dup -> lines 1-3 removed,
    # B0 and B5 survive
    assert (got[2].n_spans, got[2].n_dup_spans) == (3, 1)
    assert got[2].clean_text == "B0.\nB5."
    assert got[2].n_kept_sents == 2
    # doc 3: no spans, fully kept
    assert (got[3].n_spans, got[3].n_dup_spans, got[3].n_kept_sents) == (0, 0, 2)
    assert got[3].clean_text == c
