"""Flagship plan #2: the internal-DB RAG retrieval pipeline (SURVEY §3.1).

Reference behavior (``enhanced_internal_db_service.py:634-809``), stages a-d:

1. over-fetch ``fetch_k = max(top_k*4, top_k+5)`` nearest chunks (J4/O5)
2. score normalization + similarity floor (P7/O4)
3. relative margin cut vs best score (P8)
4. strong-anchor containment filter (P9)
5. per-group cap + round-robin diversification (W1/W2)
6. char-budget context packing (1800 default)
7. marker formatting ``《S{i}》 [id=..] ..`` (§2.8)

The reference runs these as Python list manipulation over FAISS results for
ONE query; here the whole pipeline is a single lazy DataFrame program —
scan → broadcast-scored kNN → window filters → ordered pack — and every
window is partitioned by ``q_id``, so the same plan serves a BATCH of
queries with no change: per-query state never leaves its partition group.
LLM generation (stage e) stays outside the engine boundary per SURVEY §2.10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from backend_fastapi_spark.operators import vector as V


def rag_retrieve(
    chunks: DataFrame,
    queries: DataFrame,
    anchors: list[str],
    top_k: int = 5,
    margin: float = 0.3,
    floor: float = 0.1,
    per_group_cap: int = 3,
    budget: int = 600,
    snippet_len: int = 200,
) -> DataFrame:
    """Returns (q_id, ctx_rank, doc_id, source, sim, line) — packed,
    marker-formatted context rows in presentation order, per query.

    ``chunks``: (doc_id, source, text, embedding); ``queries``: one or more
    rows (q_id, q_embedding). Anchors: pre-extracted strong anchors (the
    reference's _anchors_from_query tokenization happens query-side;
    per-query anchor sets would join a (q_id, anchor) table instead of the
    shared literal array used here).
    """
    fetch_k = max(top_k * 4, top_k + 5)

    # 1. over-fetch kNN (broadcast queries, corpus stays put)
    hits = V.knn_exact(
        chunks, queries, k=fetch_k, corpus_id="doc_id", metric="dot"
    ).withColumn("sim", F.col("score_i64").cast("double") / F.lit(1e12))

    # 2-3. similarity floor + relative margin cut vs the per-query best
    floored = hits.filter(F.col("sim") >= F.lit(floor))
    w_q = Window.partitionBy("q_id")
    best = F.max("sim").over(w_q)
    cut = F.greatest(best - F.lit(margin), best * (1.0 - F.lit(margin)))
    margined = (
        floored.withColumn("_cut", cut)
        .filter(F.col("sim") >= F.col("_cut"))
        .drop("_cut")
    )

    # 4. strong-anchor containment (P9): any anchor substring in the
    # text. NO anchors -> the filter is SKIPPED (the reference skips P9
    # when no strong anchor extracts; F.exists over an empty array is
    # always false and would drop every row). Anchors are lowercased to
    # match the lowered haystack — an uppercase anchor from the public
    # Engine.rag(anchors=...) parameter would otherwise never match.
    if anchors:
        anchor_arr = F.array(*[F.lit(a.lower()) for a in anchors])
        anchored = margined.filter(
            F.exists(anchor_arr, lambda a: F.contains(F.lower(F.col("text")), a))
        )
    else:
        anchored = margined

    # 5. per-group cap + round-robin diversification, per query
    w_grp = Window.partitionBy("q_id", "source").orderBy(
        F.col("sim").desc(), F.col("doc_id").asc()
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("grp_rank").asc(), F.col("sim").desc(), F.col("doc_id").asc()
    )
    diversified = (
        anchored.withColumn("grp_rank", F.row_number().over(w_grp))
        .filter(F.col("grp_rank") <= per_group_cap)
        .withColumn("ctx_rank", F.row_number().over(w_rank))
        .filter(F.col("ctx_rank") <= top_k)
    )

    # 6. char-budget packing over the per-query presentation order, with
    # the reference's min-remainder rule (internal_db_service.py:386-391):
    # the first snippet to overflow survives truncated to the remaining
    # budget when >100 chars remain; the monotone running sum drops
    # everything after it (the reference's break).
    snippet = F.substring("text", 1, snippet_len)
    w_pack = (
        Window.partitionBy("q_id")
        .orderBy("ctx_rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fits = F.col("_cum") <= budget
    remaining = F.lit(budget) - (F.col("_cum") - F.length("_snip"))
    packed = (
        diversified.withColumn("_snip", snippet)
        .withColumn("_cum", F.sum(F.length("_snip")).over(w_pack))
        .filter(fits | (remaining > F.lit(100)))
        .withColumn("_rem", remaining)
        .withColumn(
            "_snip",
            F.when(fits, F.col("_snip")).otherwise(
                F.expr("substring(_snip, 1, _rem)")
            ),
        )
    )

    # 7. marker formatting (enhanced:800-808)
    line = F.concat(
        F.lit("《S"),
        F.col("ctx_rank").cast("string"),
        F.lit("》 [id="),
        F.col("doc_id").cast("string"),
        F.lit("] [src="),
        F.col("source"),
        F.lit("] "),
        F.col("_snip"),
    )
    return packed.select(
        "q_id", "ctx_rank", "doc_id", "source", "sim", line.alias("line")
    )
