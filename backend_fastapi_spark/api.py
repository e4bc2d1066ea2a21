"""Engine facade — the user-facing surface a reference user would switch to.

One object wraps the capabilities the reference exposes over HTTP routes
(§3 entry points) as DataFrame-returning methods:

    eng = Engine.open(spark, "/root/testdata/sf0.01")
    eng.sql("SELECT count(*) FROM lineitem")         # relational layer
    eng.user_context()                                # /db-llm context
    eng.knn(query_vec, k=5)                           # /internal-db/query (a)
    eng.rag(query_vec, anchors=["vector"])            # /internal-db/query a-d
    eng.ingest(df, "my_index", path)                  # /internal-db/ingest
    eng.dedup_report()                                # pipeline extras

Temp views are registered for every testdata table, so ``eng.sql`` covers
the whole ad-hoc surface.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_fastapi_spark.core.catalog import Catalog
from backend_fastapi_spark.operators import dedup as D
from backend_fastapi_spark.operators import vector as V
from backend_fastapi_spark.plans.ingest import ingest_table, write_index
from backend_fastapi_spark.plans.rag_retrieval import rag_retrieve
from backend_fastapi_spark.plans.user_context import user_context


def _norm_terms(terms: "list[str] | str") -> list[str]:
    """Lowercase+strip query terms from either a comma string OR a list —
    postings are lowercased tokens, so an un-normalized 'Vector' would
    silently match nothing."""
    if isinstance(terms, str):
        terms = terms.split(",")
    return [t.strip().lower() for t in terms if t.strip()]


@dataclass
class Engine:
    spark: SparkSession
    catalog: Catalog

    @classmethod
    def open(cls, spark: SparkSession, sf_dir: str) -> "Engine":
        cat = Catalog(spark, sf_dir)
        cat.register_all()
        return cls(spark, cat)

    # -- relational -------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.catalog.table(name)

    def user_context(self, recent_n: int = 10) -> DataFrame:
        return user_context(
            self.table("customer"), self.table("orders"), recent_n
        )

    # -- vector -----------------------------------------------------------
    def _queries_df(self, query_vec: list[float]) -> DataFrame:
        # numeric q_id (outside the corpus id space) so exclude-self
        # comparisons against bigint corpus ids stay type-consistent
        return self.spark.createDataFrame(
            [(-1, [float(x) for x in query_vec])], ["q_id", "q_embedding"]
        )

    def knn(self, query_vec: list[float], k: int = 5, metric: str = "dot") -> DataFrame:
        return V.knn_exact(
            self.table("embeddings"),
            self._queries_df(query_vec),
            k=k,
            metric=metric,
            exclude_self=False,
        )

    def knn_sql(self, query_vec: list[float], k: int = 5) -> DataFrame:
        """VECTOR_SEARCH through the SQL surface (SURVEY §4 optional):
        same fixed-point top-k as ``knn`` but executed as one
        ``spark.sql`` statement over the registered ``embeddings`` view —
        array-literal query vector, codegen'd higher-order dot, no UDF."""
        vals = [float(x) for x in query_vec]
        bad = next((i for i, x in enumerate(vals) if not math.isfinite(x)), None)
        if bad is not None:
            # nan/inf render as bare SQL tokens that fail to resolve as
            # columns — raise a clear, constant-size input error instead
            raise ValueError(
                f"query_vec must be finite; element {bad} is {vals[bad]!r}"
            )
        lit = "array(" + ", ".join(f"cast({x} as double)" for x in vals) + ")"
        return self.spark.sql(V.knn_sql_statement("embeddings", lit, k=k))

    def rag(
        self,
        query_vec: list[float],
        anchors: list[str],
        top_k: int = 5,
        **kwargs,
    ) -> DataFrame:
        docs = self.table("documents").select("doc_id", "source", "text")
        emb = self.table("embeddings")
        chunks = docs.join(emb, docs.doc_id == emb.vec_id).select(
            "doc_id", "source", "text", "embedding"
        )
        return rag_retrieve(
            chunks, self._queries_df(query_vec), anchors, top_k=top_k, **kwargs
        )

    def rag_text(self, query: str, top_k: int = 5, **kwargs) -> DataFrame:
        """§3.1 end-to-end from a raw (Korean/English) query string: anchor
        extraction, query+document embedding in the same (deterministic)
        space, then the full retrieval plan."""
        from backend_fastapi_spark.functions.anchors import strong_anchors
        from backend_fastapi_spark.functions.embedder import (
            _hash_embed_one,
            hashing_embedder,
        )
        from backend_fastapi_spark.plans.rag_retrieval import rag_retrieve

        anchors = strong_anchors(query) or [query.lower()]
        embed = hashing_embedder(dim=64)
        chunks = (
            self.table("documents")
            .select("doc_id", "source", "text")
            .withColumn("embedding", embed(F.concat(F.lit("passage: "), F.col("text"))))
        )
        qvec = _hash_embed_one("passage: " + query, dim=64)
        return rag_retrieve(
            chunks, self._queries_df(qvec), anchors, top_k=top_k, **kwargs
        )

    # -- lexical / hybrid retrieval ----------------------------------------
    def keyword_search(self, terms: list[str] | str, k: int = 10) -> DataFrame:
        """Okapi BM25 top-k per query term over ``documents`` — the
        keyword half of the reference's retrieval surface
        (tool_definitions.py:12) as a ranked result instead of a contains
        filter. → (term, doc_id, bm25)."""
        from backend_fastapi_spark.operators import retrieval as RT

        return RT.bm25_topk(self.table("documents"), _norm_terms(terms), k=k)

    def hybrid_search(
        self,
        terms: list[str] | str,
        query_vec: list[float],
        k: int = 10,
        pool: int = 50,
    ) -> DataFrame:
        """One (keywords, vector) query: BM25 over the term set ⊕ exact
        cosine kNN, fused by reciprocal-rank (k=60) — the
        hybrid_rrf_topk plan shape behind a single call.
        → (doc_id, rrf) best-first."""
        from backend_fastapi_spark.operators import retrieval as RT

        from pyspark.sql import Window

        terms = _norm_terms(terms)

        def ranked(scored: DataFrame, score_col: str) -> DataFrame:
            # distributed top-pool FIRST (sort+limit = TakeOrdered, no
            # global-window funnel over the full candidate set); the rank
            # window then runs over ≤pool rows
            order = [F.col(score_col).desc(), F.col("doc_id").asc()]
            top = scored.orderBy(*order).limit(pool)
            w = Window.partitionBy("q_id").orderBy(*order)
            return top.withColumn("r", F.row_number().over(w)).select(
                "q_id", "doc_id", "r"
            )

        kw = RT.bm25_score_query(self.table("documents"), terms).withColumn(
            "q_id", F.lit(-1)
        )
        vec = V.knn_exact(
            self.table("embeddings"),
            self._queries_df(query_vec),
            k=pool,
            exclude_self=False,
        ).select("q_id", F.col("vec_id").alias("doc_id"), "score_i64")
        fused = RT.rrf_fuse([ranked(kw, "kw"), ranked(vec, "score_i64")])
        return fused.orderBy(
            F.col("rrf").desc(), F.col("doc_id").asc()
        ).limit(k).select("doc_id", "rrf")

    def mmr(
        self, query_vec: list[float], k: int = 5, shortlist: int = 20
    ) -> DataFrame:
        """MMR-diversified top-k (λ=.5) over the exact-kNN shortlist —
        the retrieve-then-diversify rerank between recall and prompt
        assembly. → (mmr_rank, vec_id, rel_i64)."""
        from backend_fastapi_spark.operators import retrieval as RT

        return RT.mmr_topk(
            self.table("embeddings"),
            self._queries_df(query_vec),
            shortlist=shortlist,
            select=k,
        ).select("mmr_rank", "vec_id", "rel_i64")

    # -- ingest -----------------------------------------------------------
    def ingest(self, df: DataFrame, index_name: str, path: str | None = None) -> DataFrame:
        chunks = ingest_table(df, index_name)
        if path:
            write_index(chunks, path, mode="append")
        return chunks

    # -- pipeline extras --------------------------------------------------
    def dedup_clusters(self, threshold: float = 0.8) -> DataFrame:
        """Near-dup PAIRS → canonical GROUPS: (doc_id, cluster_id) via
        connected components over the exact-Jaccard edge list."""
        edges = D.ngram_jaccard_pairs(
            self.table("documents"), threshold, max_shingle_df=64
        ).select("id_a", "id_b")
        return D.connected_components(edges).select(
            F.col("id").alias("doc_id"), "cluster_id"
        )

    def corpus_report(self) -> DataFrame:
        """Training-corpus prep dashboard: per-(lang, split) doc counts,
        quality-keep counts, and contaminated-test-doc counts in one
        aggregate pass per signal."""
        from backend_fastapi_spark.operators.pipeline import (
            repetition_metrics,
            split_assign,
        )

        docs = split_assign(self.table("documents"))
        base = docs.groupBy("lang", "split").agg(F.count(F.lit(1)).alias("n_docs"))
        quality = repetition_metrics(docs).withColumn(
            "keep",
            (F.col("n_words") >= 20)
            & (F.col("top_word_frac") <= 0.11)
            & (F.col("distinct_ratio") >= 0.4),
        )
        kept = (
            docs.join(quality.select("doc_id", "keep"), "doc_id")
            .groupBy("lang", "split")
            .agg(F.sum(F.col("keep").cast("long")).alias("n_quality_keep"))
        )
        return base.join(kept, ["lang", "split"], "left")

    def funnel(self) -> DataFrame:
        """Ordered view→click→purchase funnel over the events table."""
        from backend_fastapi_spark.queries import REGISTRY

        return REGISTRY["funnel_conversion"].fn(self.spark, self.catalog.base_dir)

    def retention(self) -> DataFrame:
        """Weekly cohort retention matrix over the events table."""
        from backend_fastapi_spark.queries import REGISTRY

        return REGISTRY["cohort_retention"].fn(self.spark, self.catalog.base_dir)

    def dedup_report(self, threshold: float = 0.8) -> DataFrame:
        docs = self.table("documents")
        exact = D.exact_dup_groups(docs).agg(
            F.lit("exact").alias("method"), F.count(F.lit(1)).alias("n_groups")
        )
        jac = D.ngram_jaccard_pairs(docs, threshold).agg(
            F.lit("jaccard").alias("method"), F.count(F.lit(1)).alias("n_groups")
        )
        lsh = D.minhash_lsh_pairs(docs).agg(
            F.lit("minhash_lsh").alias("method"), F.count(F.lit(1)).alias("n_groups")
        )
        return exact.unionByName(jac).unionByName(lsh)

    def scrub(self, df: DataFrame | None = None, text_col: str = "text") -> DataFrame:
        """Corpus PII redaction (operators/text.py::scrub_pii): returns the
        input (default: the documents table) with ``scrubbed`` +
        per-kind match counts — the pass a training pipeline runs before
        tokenization."""
        from backend_fastapi_spark.operators.text import scrub_pii

        return scrub_pii(df if df is not None else self.table("documents"),
                         text_col)

    def pii_report(self, text_col: str = "text") -> DataFrame:
        """Per-source PII incidence: doc counts + email/URL/phone match
        totals over the documents table. Zeroes on a clean corpus — the
        point of the report is proving it."""
        return (
            self.scrub(text_col=text_col)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_url").alias("n_url"),
                F.sum("n_email").alias("n_email"),
                F.sum("n_phone").alias("n_phone"),
            )
        )

    def compact_table(
        self, src: str, dst: str, target_bytes: int | None = None
    ) -> dict:
        """Small-file compaction (operators/maintenance.py::compact):
        rewrite the parquet directory at ``src`` into ``dst`` at ~128 MB
        files (or ``target_bytes``), returning before/after file stats.
        Write-then-swap; ``src`` is never mutated."""
        from backend_fastapi_spark.operators import maintenance as M

        if target_bytes is None:
            return M.compact(self.spark, src, dst)
        return M.compact(self.spark, src, dst, target_bytes=target_bytes)

    def cluster_table(
        self, df: DataFrame, dst: str, sort_cols: list[str], n_files: int
    ) -> dict:
        """Sort-on-write clustering (operators/maintenance.py::
        cluster_write): range-partition + sort ``df`` on ``sort_cols``
        into ``n_files`` parquet files so row-group min/max stats prune
        selective scans; returns the written layout's file stats."""
        from backend_fastapi_spark.operators import maintenance as M

        M.cluster_write(df, dst, sort_cols, n_files)
        return M.file_stats(self.spark, dst)

    def zorder_table(
        self, df: DataFrame, dst: str, cols: list[str], n_files: int
    ) -> dict:
        """Multi-column skipping layout (operators/maintenance.py::
        zorder_write): cluster ``df`` on the 2-D Z-order interleave of
        ``cols`` so row-group envelopes stay selective for range
        predicates on EITHER column; returns the written layout's file
        stats."""
        from backend_fastapi_spark.operators import maintenance as M

        M.zorder_write(df, dst, cols, n_files)
        return M.file_stats(self.spark, dst)

    def bucket_table(
        self, df: DataFrame, table: str, bucket_cols: list[str],
        n_buckets: int,
    ) -> DataFrame:
        """Persist ``df`` as a catalog-backed bucketed table
        (operators/maintenance.py::write_bucketed) and return it: two
        tables bucketed identically on a join key sort-merge-join with
        zero Exchange — pay the shuffle once at write time, not per
        query."""
        from backend_fastapi_spark.operators import maintenance as M

        M.write_bucketed(df, table, bucket_cols, n_buckets)
        return self.spark.table(table)

    def clean_pages(
        self, df: DataFrame | None = None, text_col: str = "text",
        min_line_words: int = 3, min_kept_lines: int = 3,
    ) -> DataFrame:
        """C4-style page cleaning (operators/text.py::c4_line_filter):
        line-level terminal-punctuation / min-words / boilerplate rules
        plus page-level lorem-ipsum / brace / min-kept-lines drops;
        adds n_lines, n_kept_lines, doc_kept, clean_text."""
        from backend_fastapi_spark.operators.text import c4_line_filter

        return c4_line_filter(
            df if df is not None else self.table("documents"),
            text_col, min_line_words, min_kept_lines,
        )

    def semantic_dedup(
        self, threshold: float = 0.25, with_lsh_union: bool = False
    ) -> DataFrame:
        """Semantic near-dup pairs over the embeddings table (SemDeDup;
        operators/semdedup.py). ``with_lsh_union=True`` unions the
        clustering-independent RP-LSH pass — the cluster-boundary
        recall mitigation (pairs found by both carry identical scores,
        so the union is a plain DISTINCT)."""
        from backend_fastapi_spark.operators.semdedup import (
            semantic_dedup_pairs,
            semantic_dedup_union_pairs,
        )
        from backend_fastapi_spark.operators.vector import FIXED_SCALE

        emb = self.table("embeddings")
        tau = int(threshold * FIXED_SCALE * FIXED_SCALE)
        if with_lsh_union:
            return semantic_dedup_union_pairs(emb, threshold_i64=tau)
        return semantic_dedup_pairs(emb, threshold_i64=tau).select(
            "id_a", "id_b", "score_i64"
        )
