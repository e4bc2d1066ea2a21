"""Plan-shape audit: walk every registered query's plans and flag
scale-killers — the enforcement half of SCALING.md.

Flags:
  * ``global_window`` — a logical ``Window`` node with an empty
    partitionSpec: every row funnels through ONE task regardless of
    cluster size. (VERDICT r1 "what's wrong" #3.)
  * ``cartesian`` — ``CartesianProduct`` / inner ``BroadcastNestedLoopJoin``
    in the physical plan: O(n·m) pair blowup.

Used by ``tests/test_plan_audit.py`` (hard gate, allowlist-free for
global windows) and ``EXPLAIN_AUDIT.md`` generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _scala_seq(jseq):
    return [jseq.apply(i) for i in range(jseq.length())]


def _walk(jnode):
    yield jnode
    for child in _phys_children(jnode):
        yield from _walk(child)
    # subqueries (scalar subquery plans hang off expressions, skipped:
    # none of the registry's subqueries window or cross-join)


def _phys_children(jnode):
    """Children of a plan node, descending THROUGH the AQE wrappers:
    ``AdaptiveSparkPlanExec`` and ``QueryStageExec`` expose their subtree
    as a field, not via ``children()`` — a naive walk sees an empty tree
    and the physical audit silently passes everything (found via the
    gate's own negative test, round 4)."""
    cls = jnode.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        # pre-execution static shape: AQE can only improve on it at runtime
        return [jnode.initialPlan()]
    if cls.endswith("QueryStageExec"):
        return [jnode.plan()]
    return _scala_seq(jnode.children())


def _subtree_has_aggregate(jnode, scalar_only: bool = False) -> bool:
    for n in _walk(jnode):
        cls = n.getClass().getSimpleName()
        if cls in ("Aggregate", "HashAggregateExec", "ObjectHashAggregateExec",
                   "SortAggregateExec"):
            if not scalar_only:
                return True
            # scalar aggregate = no grouping keys → at most 1 row. Ask the
            # node directly: string forms differ per operator
            # (HashAggregate "keys=[]" vs SortAggregate "key=[]").
            try:
                if n.groupingExpressions().isEmpty():
                    return True
            except Exception:
                s = n.simpleString(32)
                if "keys=[]" in s or "key=[]" in s or "[], [" in s:
                    return True
    return False


def audit_plan(df: DataFrame) -> dict[str, list[str]]:
    """Return {flag: [node summaries]} for one DataFrame's plans."""
    flags: dict[str, list[str]] = {"global_window": [], "cartesian": []}

    qe = df._jdf.queryExecution()
    for node in _walk(qe.optimizedPlan()):
        cls = node.getClass().getSimpleName()
        if cls == "Window" and node.partitionSpec().isEmpty():
            # A global window whose input already passed through a grouped
            # aggregate (block/bucket summary) is a bounded-size scan step
            # (two-level prefix-scan shape), not a raw-row funnel.
            if not _subtree_has_aggregate(node.child()):
                flags["global_window"].append(node.simpleStringWithNodeId())
    for node in _walk(qe.executedPlan()):
        cls = node.getClass().getSimpleName()
        if cls == "CartesianProductExec":
            flags["cartesian"].append(cls)
        elif cls == "BroadcastNestedLoopJoinExec":
            # inner/cross BNLJ is a pair blowup UNLESS the broadcast side is
            # a scalar (groupBy-less) aggregate — the 1-row augment idiom.
            jt = node.joinType().toString()
            if jt in ("Inner", "Cross") and not (
                _subtree_has_aggregate(node.left(), scalar_only=True)
                or _subtree_has_aggregate(node.right(), scalar_only=True)
            ):
                flags["cartesian"].append(f"{cls}({jt})")
    return {k: v for k, v in flags.items() if v}
