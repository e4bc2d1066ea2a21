"""Emit-order invariants for the driver-evidence bookkeeping.

The driver hash-checks only a budget-capped prefix of queries(), so the
ordering IS the evidence-refresh policy (COVERAGE.md "freshness &
rotation"). These tests pin its invariants so a registry edit can't
silently push stale or never-verified work past the budget horizon.
"""

from __future__ import annotations

import json
import subprocess
import sys
import os

from backend_fastapi_spark import queries as Q

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiers() -> dict[str, int]:
    names = Q._ordered_names()
    return {n: i for i, n in enumerate(names)}


def test_priority_refresh_block_leads():
    pos = _tiers()
    prio = [n for n in Q._PRIORITY_REFRESH if n in Q.REGISTRY]
    stale_prio = [
        n for n in prio
        if Q._LAST_GREEN.get(n) is not None
        and Q._LAST_GREEN[n] < Q._DATA_GEN_ROUND
    ]
    # every stale priority name sits in the leading block, in list order
    got = sorted(stale_prio, key=lambda n: pos[n])
    assert got == stale_prio
    assert all(pos[n] < len(stale_prio) for n in stale_prio)


def test_never_green_oracle_queries_precede_other_stale():
    # tier 1 is ANY oracle-bearing query without a green row — including
    # one promoted from rows-only (the set must not demote a new oracle)
    pos = _tiers()
    new = [
        n for n in Q.REGISTRY
        if Q._LAST_GREEN.get(n) is None
        and Q.REGISTRY[n].oracle is not None
    ]
    nonprio_stale = [
        n for n in Q.REGISTRY
        if Q._LAST_GREEN.get(n) is not None
        and Q._LAST_GREEN[n] < Q._DATA_GEN_ROUND
        and n not in Q._PRIORITY_REFRESH
    ]
    if new and nonprio_stale:
        assert max(pos[n] for n in new) < min(pos[n] for n in nonprio_stale)


def test_stale_greens_precede_fresh_greens():
    pos = _tiers()
    stale = [
        n for n in Q.REGISTRY
        if Q._LAST_GREEN.get(n) is not None
        and Q._LAST_GREEN[n] < Q._DATA_GEN_ROUND
    ]
    fresh = [
        n for n in Q.REGISTRY
        if Q._LAST_GREEN.get(n, 0) >= Q._DATA_GEN_ROUND
    ]
    if stale and fresh:  # vacuous once a round greens everything fresh
        assert max(pos[n] for n in stale) < min(pos[n] for n in fresh)


def test_stale_greens_ordered_oldest_first_within_tier():
    pos = _tiers()
    nonprio_stale = sorted(
        (
            n for n in Q.REGISTRY
            if Q._LAST_GREEN.get(n) is not None
            and Q._LAST_GREEN[n] < Q._DATA_GEN_ROUND
            and n not in Q._PRIORITY_REFRESH
        ),
        key=lambda n: pos[n],
    )
    rounds = [Q._LAST_GREEN[n] for n in nonprio_stale]
    assert rounds == sorted(rounds)


def test_fresh_greens_ordered_oldest_first_within_tier():
    # VERDICT r06 #1 twin invariant: once all greens are fresh, tier 5
    # must still rotate by evidence age — the sweep prefix keeps cycling
    # instead of freezing on registry insertion order.
    pos = _tiers()
    fresh = sorted(
        (
            n for n in Q.REGISTRY
            if Q._LAST_GREEN.get(n, 0) >= Q._DATA_GEN_ROUND
        ),
        key=lambda n: pos[n],
    )
    rounds = [Q._LAST_GREEN[n] for n in fresh]
    assert rounds == sorted(rounds)


def test_emit_order_sidecar_matches_committed():
    # queries() is a plain accessor (no repo writes — ADVICE r05 #3); the
    # committed sidecar must equal the computed order, else someone edited
    # ordering state without rerunning scripts/write_emit_order.py
    path = os.path.join(ROOT, "QUERY_EMIT_ORDER.json")
    committed = json.load(open(path))
    assert committed == Q.emit_order_doc()
    assert committed["data_gen_round"] == Q._DATA_GEN_ROUND
    assert len(committed["order"]) == len(Q.REGISTRY)
    assert committed["order"][0]["pos"] == 0


def test_update_verified_script_round_parsing():
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "update_verified.py"),
         os.path.join(ROOT, "CORRECTNESS_r04.json")],
        capture_output=True, text=True, check=True,
    )
    assert "_LAST_GREEN = {" in out.stdout
    assert "_ROWS_ONLY_LAST_EXERCISED = {" in out.stdout
    # every emitted name is registered and every round is sane
    for block in out.stdout.split(" = {")[1:]:
        body = block.split("}", 1)[0]
        for line in body.strip().splitlines():
            name, rnd = line.strip().rstrip(",").split(": ")
            assert name.strip('"') in Q.REGISTRY
            assert 1 <= int(rnd) <= 99


def test_rows_only_rotate_with_fresh_greens_by_recency():
    # VERDICT r12 #1: rows-only-by-design queries must NOT head the sweep
    # as permanent no_oracle rows — they interleave with fresh greens by
    # exercise recency, so the budget-capped prefix prefers the oldest
    # evidence regardless of kind.
    pos = _tiers()
    ro = {n: r for n, r in Q._ROWS_ONLY_LAST_EXERCISED.items()
          if Q._LAST_GREEN.get(n) is None}
    fresh = {n: Q._LAST_GREEN[n] for n in Q.REGISTRY
             if Q._LAST_GREEN.get(n, 0) >= Q._DATA_GEN_ROUND}
    for n, r in ro.items():
        # every fresh green with strictly older evidence sorts before it
        for g, gr in fresh.items():
            if gr < r:
                assert pos[g] < pos[n], (g, gr, n, r)
            elif gr > r:
                assert pos[g] > pos[n], (g, gr, n, r)
    # combined tier-5 stream is non-decreasing in evidence round
    merged = sorted({**fresh, **ro}, key=lambda n: pos[n])
    rounds = [({**fresh, **ro})[n] for n in merged]
    assert rounds == sorted(rounds)
