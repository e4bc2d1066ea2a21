"""Hard gate: no registered query may carry a scale-killer plan shape.

VERDICT r1 "what's wrong" #3 named unpartitioned-window footguns; this
test walks every registered query's optimized + physical plan and fails
on (a) a global Window over raw (non-aggregated) rows — an all-rows
single-task funnel — and (b) a cartesian pair blowup that is not the
1-row scalar-aggregate augment idiom. See tests/plan_audit.py for the
exact rules and EXPLAIN_AUDIT.md for the committed audit.
"""

from __future__ import annotations

from backend_fastapi_spark import queries as Q
from tests.conftest import SF_SMOKE
from tests.plan_audit import audit_plan


def test_no_scale_killer_plan_shapes(spark):
    bad = {}
    for name, spec in Q.REGISTRY.items():
        flags = audit_plan(spec.fn(spark, SF_SMOKE))
        if flags:
            bad[name] = flags
    assert not bad, f"scale-killer plan shapes: {bad}"
