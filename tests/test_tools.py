"""Tool-calling dispatch tests: brace-counting parse + dispatch table."""

from __future__ import annotations

import pytest

from backend_fastapi_spark.api import Engine
from backend_fastapi_spark.tools import execute_tool, parse_tool_call
from tests.conftest import SF_ORACLE


def test_parse_tool_call_brace_counting():
    text = 'thinking... TOOL_CALL: {"tool": "get_spend_summary", "args": {"user_id": 7}} done'
    assert parse_tool_call(text) == {
        "tool": "get_spend_summary",
        "args": {"user_id": 7},
    }
    # nested braces and braces inside strings must not confuse the scanner
    tricky = 'TOOL_CALL: {"tool": "search_knowledge", "args": {"keywords": "a{b}c, }", "opts": {"x": 1}}}'
    got = parse_tool_call(tricky)
    assert got["args"]["keywords"] == "a{b}c, }"
    assert got["args"]["opts"] == {"x": 1}
    # escaped quotes inside strings
    esc = 'TOOL_CALL: {"tool": "t", "args": {"s": "he said \\"hi{\\" ok"}}'
    assert parse_tool_call(esc)["args"]["s"] == 'he said "hi{" ok'
    assert parse_tool_call("no call here") is None
    assert parse_tool_call("TOOL_CALL: {broken json}") is None


def test_dispatch_tools(spark):
    eng = Engine.open(spark, SF_ORACLE)
    out = execute_tool(
        eng, {"tool": "get_recent_orders", "args": {"user_id": 7, "limit": 3}}
    ).collect()
    assert len(out) <= 3 and all(r.o_custkey == 7 for r in out)
    # recency ordering
    dates = [r.o_orderdate for r in out]
    assert dates == sorted(dates, reverse=True)

    summary = execute_tool(
        eng, {"tool": "get_spend_summary", "args": {"user_id": 7}}
    ).head()
    assert summary.n_orders == len(
        eng.table("orders").filter("o_custkey = 7").collect()
    )

    docs = execute_tool(
        eng, {"tool": "search_knowledge", "args": {"keywords": "vector, stream"}}
    ).collect()
    assert 0 < len(docs) <= 5

    with pytest.raises(KeyError, match="unknown tool"):
        execute_tool(eng, {"tool": "rm_rf_slash", "args": {}})


def test_end_to_end_tool_loop_shape(spark):
    """One simulated agent turn: LLM text → parse → dispatch → result rows
    (the ≤5-iteration loop minus the LLM, which stays outside the engine)."""
    eng = Engine.open(spark, SF_ORACLE)
    llm_output = (
        "I need the user's spending.\n"
        'TOOL_CALL: {"tool": "get_spend_summary", "args": {"user_id": 42}}'
    )
    call = parse_tool_call(llm_output)
    result = execute_tool(eng, call).collect()
    assert len(result) == 1
    tool_result = result[0].asDict()
    assert set(tool_result) == {"n_orders", "total_spend"}
