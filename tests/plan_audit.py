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
    for child in _scala_seq(jnode.children()):
        yield from _walk(child)
    # subqueries (scalar subquery plans hang off expressions, skipped:
    # none of the registry's subqueries window or cross-join)


def _subtree_has_aggregate(jnode, scalar_only: bool = False) -> bool:
    for n in _walk(jnode):
        cls = n.getClass().getSimpleName()
        if cls in ("Aggregate", "HashAggregateExec", "ObjectHashAggregateExec",
                   "SortAggregateExec"):
            if not scalar_only:
                return True
            # scalar aggregate = no grouping keys → at most 1 row
            if "keys=[]" in n.simpleString(32) or "[], [" in n.simpleString(32):
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
