"""Tool-calling dispatch — SURVEY §2.10 L3 (§3.5 entry point).

The reference's agentic loop (``tool_calling_wrapper.py:145-189``) parses
``TOOL_CALL: {json}`` blocks from LLM output (brace-counting parser,
``:110-143``) and dispatches to 15 tools (``tool_executor.py:48-85``), each
of which is a SQL/RAG/HTTP operator. The LLM itself stays outside the
engine; what the engine owns is (a) the deterministic TOOL_CALL parser and
(b) the dispatch table whose entries are DataFrame programs from the
operator library.

Tool names mirror the reference's ``tool_definitions.py`` surface, mapped
onto the driver's star schema.
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql import DataFrame, functions as F

from backend_fastapi_spark.api import Engine


def parse_tool_call(text: str) -> dict[str, Any] | None:
    """Brace-counting TOOL_CALL extractor (tool_calling_wrapper.py:110-143):
    find ``TOOL_CALL:``, then scan forward matching braces (string-aware)
    and json-parse the balanced object. Returns None when absent/invalid."""
    marker = "TOOL_CALL:"
    idx = text.find(marker)
    if idx == -1:
        return None
    start = text.find("{", idx)
    if start == -1:
        return None
    depth = 0
    in_str = False
    escape = False
    for i in range(start, len(text)):
        ch = text[i]
        if escape:
            escape = False
            continue
        if ch == "\\":
            escape = True
            continue
        if ch == '"':
            in_str = not in_str
            continue
        if in_str:
            continue
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                try:
                    return json.loads(text[start : i + 1])
                except json.JSONDecodeError:
                    return None
    return None


def build_tool_registry(eng: Engine) -> dict[str, Callable[..., DataFrame]]:
    """The dispatch table: every tool is a DataFrame program over the
    engine's operator library (reference tools → star-schema analogs)."""

    def recent_orders(user_id: int, limit: int = 10) -> DataFrame:
        return (
            eng.table("orders")
            .filter(F.col("o_custkey") == user_id)
            .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
            .limit(limit)
        )

    def spend_summary(user_id: int) -> DataFrame:
        return (
            eng.table("orders")
            .filter(F.col("o_custkey") == user_id)
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
                .cast("double")
                .alias("total_spend"),
            )
        )

    def upcoming_events(user_id: int, limit: int = 5) -> DataFrame:
        return (
            eng.table("events")
            .filter(F.col("user_id") == user_id)
            .orderBy(F.col("ts").asc(), F.col("event_id").asc())
            .limit(limit)
        )

    def search_documents(keywords: str, limit: int = 5) -> DataFrame:
        kws = [k.strip().lower() for k in keywords.split(",") if k.strip()]
        # Malformed TOOL_CALL with empty/whitespace keywords → clean empty
        # result, not a filter(None) TypeError.
        cond = F.lit(False)
        for kw in kws:
            cond = cond | F.lower(F.col("text")).contains(kw)
        return eng.table("documents").filter(cond).limit(limit)

    def grocery_prices(product: str | None = None) -> DataFrame:
        from backend_fastapi_spark.sources.json_source import read_grocery_deals

        flat = read_grocery_deals(eng.spark)
        if product:
            flat = flat.filter(F.col("product") == product)
        return flat.orderBy("product", "price", "store")

    def vector_search(query_vec: list[float], k: int = 5) -> DataFrame:
        return eng.knn(query_vec, k=k)

    return {
        "get_recent_orders": recent_orders,       # finance_items analog
        "get_spend_summary": spend_summary,       # SUM(amount) analog
        "get_upcoming_events": upcoming_events,   # calendar_events analog
        "search_knowledge": search_documents,     # internal-db RAG tool
        "get_grocery_prices": grocery_prices,     # grocery RAG tool
        "vector_search": vector_search,           # kNN tool
    }


def execute_tool(eng: Engine, call: dict[str, Any]) -> DataFrame:
    """Dispatch one parsed TOOL_CALL {"tool": name, "args": {...}}."""
    registry = build_tool_registry(eng)
    name = call.get("tool")
    if name not in registry:
        raise KeyError(f"unknown tool: {name!r}; available: {sorted(registry)}")
    return registry[name](**call.get("args", {}))
