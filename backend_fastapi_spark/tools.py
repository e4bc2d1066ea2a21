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
import os
from typing import Any, Callable

from pyspark.sql import DataFrame, functions as F

from backend_fastapi_spark.api import Engine
from backend_fastapi_spark.personal import PersonalStore

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


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
                except (json.JSONDecodeError, RecursionError):
                    # RecursionError: adversarially deep '{'*N nesting —
                    # the contract is None on invalid, never a raise
                    return None
    return None


def build_tool_registry(
    eng: Engine, store: PersonalStore | None = None
) -> dict[str, Callable[..., DataFrame]]:
    """The dispatch table: the reference's full 15-tool surface
    (``tool_definitions.py:5-241``) plus engine-native extensions, every
    tool a DataFrame program over the operator library. Personal-state
    tools route through ``PersonalStore`` batch merges."""
    store = store or PersonalStore.bootstrap(eng.spark)

    # ---- reference surface (15 names, tool_definitions.py order) --------
    def get_news(keyword: str | None = None, limit: int = 5) -> DataFrame:
        from backend_fastapi_spark.sources.feeds import parse_rss_items

        with open(os.path.join(_DATA_DIR, "news_feed.xml")) as f:
            xml = f.read()
        feeds = eng.spark.range(1).select(
            F.lit("file://news_feed.xml").alias("feed_url"), F.lit(xml).alias("xml")
        )
        items = parse_rss_items(feeds)
        if keyword:
            kw = keyword.strip().lower()
            items = items.filter(
                F.lower("title").contains(kw) | F.lower("description").contains(kw)
            )
        # pub_date is a raw RFC-822 string ('Mon, 03 Jun 2024 ...'):
        # a lexicographic sort orders by weekday NAME, so parse to a
        # timestamp for recency; unparseable dates sort last, then the
        # raw string + link totalize the order.
        # (Spark >= 3 rejects 'EEE' in PARSE patterns, so strip the
        # weekday prefix and parse the remainder)
        ts = F.try_to_timestamp(
            F.ltrim(F.substring_index(F.col("pub_date"), ",", -1)),
            F.lit("dd MMM yyyy HH:mm:ss Z"),
        )
        return items.orderBy(
            ts.desc_nulls_last(), F.col("pub_date").desc(), "link"
        ).limit(limit)

    def get_weather(location: str = "Seoul") -> DataFrame:
        # Reference returns fixed dummy weather (tool_executor.py:121-135:
        # no real API behind it); ours is a deterministic function of the
        # location string so distinct locations give distinct rows.
        return eng.spark.range(1).select(
            F.lit(location).alias("location"),
            (F.pmod(F.xxhash64(F.lit(location)), F.lit(15)) + 15).cast("int").alias("temperature_c"),
            F.element_at(
                F.array(F.lit("clear"), F.lit("cloudy"), F.lit("rain")),
                (F.pmod(F.xxhash64(F.lit(location), F.lit(1)), F.lit(3)) + 1).cast("int"),
            ).alias("description"),
            (F.pmod(F.xxhash64(F.lit(location), F.lit(2)), F.lit(40)) + 40).cast("int").alias("humidity_pct"),
        )

    def get_health_status(user_id: int = 1) -> DataFrame:
        """Diseases + medications rolled into one health-context row
        (tool_executor.py:136-167)."""
        d = (
            store.diseases.filter(F.col("user_id") == user_id)
            .groupBy("user_id")
            .agg(
                F.sort_array(F.collect_list("name")).alias("diseases"),
                F.sum(F.when(F.col("status") == "active", 1).otherwise(0)).alias("n_active"),
            )
        )
        m = (
            store.medications.filter(F.col("user_id") == user_id)
            .groupBy("user_id")
            .agg(F.sort_array(F.collect_list("name")).alias("medications"))
        )
        # seed row: a user with NO diseases AND NO medications joins
        # two empty frames — without the anchor the tool returns zero
        # rows and the agent never sees the healthy-default state
        seed = eng.spark.range(1).select(F.lit(user_id).alias("user_id"))
        meds = F.coalesce("medications", F.array().cast("array<string>"))
        return (
            seed.join(d, "user_id", "left")
            .join(m, "user_id", "left")
            .select(
                "user_id",
                F.coalesce("diseases", F.array().cast("array<string>")).alias("diseases"),
                meds.alias("medications"),
                # size over the COALESCED array: legacy sizeOfNull gives
                # size(NULL) = -1, which would INFLATE the score
                (100 - F.coalesce("n_active", F.lit(0)) * 10
                 - F.size(meds) * 2).alias("health_score"),
            )
        )

    def get_diseases(user_id: int = 1) -> DataFrame:
        return (
            store.diseases.filter(F.col("user_id") == user_id)
            .select("disease_id", "name", "diagnosed_date", "status")
            .orderBy("disease_id")
        )

    def get_medications(user_id: int = 1) -> DataFrame:
        return (
            store.medications.filter(F.col("user_id") == user_id)
            .select("med_id", "name", "dosage", "intake_time")
            .orderBy("med_id")
        )

    def add_disease(
        name: str, diagnosed_date: str | None = None, status: str = "active",
        user_id: int = 1,
    ) -> DataFrame:
        return store.add_disease(user_id, name, diagnosed_date, status)

    def add_medication(
        name: str, dosage: str | None = None, intake_time: str | None = None,
        user_id: int = 1,
    ) -> DataFrame:
        return store.add_medication(user_id, name, dosage, intake_time)

    def get_finance_updates(category: str | None = None) -> DataFrame:
        """Market-wide chart bars from fetched payloads
        (yahoo_finance_service.py shape; parse is S10)."""
        from backend_fastapi_spark.sources.feeds import parse_chart_payload

        payloads = eng.spark.read.json(
            os.path.join(_DATA_DIR, "market_payloads.jsonl")
        )
        if category:
            payloads = payloads.filter(F.col("category") == category)
        return parse_chart_payload(payloads).orderBy("symbol", "ts")

    def get_finance_items(category: str | None = None, user_id: int = 1) -> DataFrame:
        items = store.finance_items.filter(F.col("user_id") == user_id)
        # total_assets = the USER'S full total (the figure the reference
        # reports), computed BEFORE any category filter — filtering
        # first would make 'total_assets' silently mean 'category total'
        total = items.groupBy().agg(
            F.sum("amount").alias("_total")
        )
        if category:
            items = items.filter(F.col("category") == category)
        return (
            items.crossJoin(F.broadcast(total))
            .select("item_id", "name", "category", "amount", F.col("_total").alias("total_assets"))
            .orderBy("item_id")
        )

    def get_calendar_events(
        date: str | None = None, limit: int = 10, user_id: int = 1
    ) -> DataFrame:
        ev = store.calendar_events.filter(F.col("user_id") == user_id)
        if date:
            ev = ev.filter(F.col("event_date") == date)
        return (
            ev.select("event_id", "title", "event_date", "event_time",
                      "event_type", "location", "description")
            .orderBy("event_date", "event_time", "event_id")
            .limit(limit)
        )

    def add_calendar_event(
        title: str, event_date: str, event_time: str,
        event_type: str = "appointment", location: str | None = None,
        description: str | None = None, user_id: int = 1,
    ) -> DataFrame:
        return store.add_calendar_event(
            user_id, title, event_date, event_time, event_type, location, description
        )

    def delete_calendar_event(event_id: int, user_id: int = 1) -> DataFrame:
        return store.delete_calendar_event(user_id, event_id)

    def get_diet_plan(date: str | None = None, user_id: int = 1) -> DataFrame:
        """Health context for diet recommendation — the reference returns
        disease+medication names for the LLM to reason over
        (tool_executor.py:556-588); the LLM stays outside the engine."""
        return get_health_status(user_id).select(
            "user_id", "diseases", "medications",
            (F.size("diseases") + F.size("medications") > 0).alias("has_health_info"),
        )

    def get_notifications(limit: int = 5, user_id: int = 1) -> DataFrame:
        return (
            store.notifications
            .filter((F.col("user_id") == user_id) & (~F.col("is_read")))
            .select("notification_id", "notification_type", "title",
                    "message", "priority", "created_at")
            .orderBy(F.col("created_at").desc(), "notification_id")
            .limit(limit)
        )

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
        # order before limit: an unordered limit returns whichever rows
        # the scan touches first — nondeterministic knowledge context
        return eng.table("documents").filter(cond).orderBy("doc_id").limit(limit)

    def grocery_prices(product: str | None = None) -> DataFrame:
        from backend_fastapi_spark.sources.json_source import read_grocery_deals

        flat = read_grocery_deals(eng.spark)
        if product:
            flat = flat.filter(F.col("product") == product)
        return flat.orderBy("product", "price", "store")

    def vector_search(query_vec: list[float], k: int = 5) -> DataFrame:
        return eng.knn(query_vec, k=k)

    return {
        # reference surface — tool_definitions.py:5-241, all 15 names
        "get_news": get_news,
        "get_weather": get_weather,
        "get_health_status": get_health_status,
        "get_diseases": get_diseases,
        "get_medications": get_medications,
        "add_disease": add_disease,
        "add_medication": add_medication,
        "get_finance_updates": get_finance_updates,
        "get_finance_items": get_finance_items,
        "get_calendar_events": get_calendar_events,
        "add_calendar_event": add_calendar_event,
        "delete_calendar_event": delete_calendar_event,
        "get_diet_plan": get_diet_plan,
        "get_notifications": get_notifications,
        "get_grocery_prices": grocery_prices,
        # engine-native extensions over the star schema
        "get_recent_orders": recent_orders,
        "get_spend_summary": spend_summary,
        "get_upcoming_events": upcoming_events,
        "search_knowledge": search_documents,
        "vector_search": vector_search,
    }


#: The reference's tool surface (tool_definitions.py:5-241) — parity target.
REFERENCE_TOOL_NAMES = (
    "get_news", "get_weather", "get_health_status", "get_diseases",
    "get_medications", "add_disease", "add_medication",
    "get_finance_updates", "get_finance_items", "get_calendar_events",
    "add_calendar_event", "delete_calendar_event", "get_diet_plan",
    "get_notifications", "get_grocery_prices",
)


def execute_tool(
    eng: Engine, call: dict[str, Any], store: PersonalStore | None = None
) -> DataFrame:
    """Dispatch one parsed TOOL_CALL {"tool": name, "args": {...}}.

    Pass a ``PersonalStore`` to thread mutable personal state across an
    agent session (otherwise each call sees the bootstrap image)."""
    registry = build_tool_registry(eng, store)
    name = call.get("tool")
    if name not in registry:
        raise KeyError(f"unknown tool: {name!r}; available: {sorted(registry)}")
    args = call.get("args") or {}
    if not isinstance(args, dict):
        # untrusted LLM output: 'args': null / [1] must not TypeError
        # inside the tool — treat as no-args
        args = {}
    return registry[name](**args)
