"""Physical-plan audit utilities.

A plan that is correct at sf0.01 can still be wrong at 100 TB: a filter
that doesn't reach the parquet scan re-reads the lake; a dimension join
that isn't broadcast shuffles the fact table; a projection that doesn't
prune columns drags every byte through the scan. These helpers turn
those properties into assertions so tests pin the PLAN, not just the
rows (SURVEY.md §4.2: verify pushdown "with explain() in tests").

All checks parse ``explain("formatted")`` output — the public, stable
surface — rather than touching Catalyst internals.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string.

    For an executed adaptive plan the explain output contains BOTH the
    final and the initial plan; the initial section is dropped so node
    counts aren't doubled.
    """
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    marker = "== Initial Plan =="
    if marker in plan:
        head, _, tail = plan.partition(marker)
        # keep the node-detail sections that follow the tree listing
        detail_start = tail.find("\n\n")
        plan = head + (tail[detail_start:] if detail_start != -1 else "")
    return plan


def plan_summary(df: DataFrame) -> dict[str, int]:
    """Counts of the plan features the scale review cares about."""
    plan = explain_formatted(df)
    # count nodes in the TREE section only — the per-node detail blocks
    # (`(1) Scan parquet ...`) repeat every node name and would double
    # every count.
    m = re.search(r"(?m)^\(\d+\) ", plan)
    tree = plan[: m.start()] if m else plan
    # formatted mode marks codegen'd operators with a `* ` prefix in the
    # tree (e.g. `+- * HashAggregate (9)`), not a WholeStageCodegen node.
    codegen_ops = len(re.findall(r"(?m)^[\s+:|-]*\* \w", tree))
    return {
        "exchanges": tree.count("Exchange"),
        "broadcast_joins": tree.count("BroadcastHashJoin"),
        "sort_merge_joins": tree.count("SortMergeJoin"),
        "scans": tree.count("Scan parquet"),
        "reused_exchanges": tree.count("ReusedExchange"),
        "codegen_spans": codegen_ops,
    }


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear in a scan's PushedFilters list.

    Fragments are column names (``"l_shipdate"``) or full predicates
    (``"LessThanOrEqual(l_shipdate"``) — substring match against the
    PushedFilters lines only, so a filter that runs post-scan does not
    satisfy the check.
    """
    plan = explain_formatted(df)
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    missing = [f for f in fragments if f not in pushed]
    if missing:
        raise AssertionError(
            f"filters not pushed to scan: {missing}\nPushedFilters lines:\n{pushed or '(none)'}"
        )


def assert_read_schema_pruned(df: DataFrame, table_cols: int, max_cols: int) -> None:
    """The widest parquet ReadSchema must keep ≤ max_cols of table_cols
    columns — catches accidental SELECT * through a projection."""
    plan = explain_formatted(df)
    widths = []
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            schema = ln.split("ReadSchema:", 1)[1]
            widths.append(schema.count(":"))
    if not widths:
        raise AssertionError("no parquet ReadSchema found in plan")
    if max(widths) > max_cols:
        raise AssertionError(
            f"scan reads {max(widths)} of {table_cols} columns (budget {max_cols}):\n"
            + "\n".join(ln for ln in plan.splitlines() if "ReadSchema" in ln)
        )


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    """At least min_count BroadcastHashJoins (dim tables must not shuffle
    the fact side)."""
    n = plan_summary(df)["broadcast_joins"]
    if n < min_count:
        raise AssertionError(f"expected ≥{min_count} BroadcastHashJoin, found {n}")


def assert_no_cartesian(df: DataFrame, allow_bnlj: bool = False) -> None:
    """No CartesianProduct / BroadcastNestedLoopJoin without an explicit
    opt-in — the ones that melt at 100 TB.

    ``allow_bnlj=True`` is the opt-in for operators that intentionally
    broadcast a tiny side into a theta-join (cosine_topk's query-set
    broadcast); a CartesianProduct is never allowed.
    """
    plan = explain_formatted(df)
    if "CartesianProduct" in plan:
        raise AssertionError("plan contains CartesianProduct")
    if not allow_bnlj and "BroadcastNestedLoopJoin" in plan:
        raise AssertionError(
            "plan contains BroadcastNestedLoopJoin (a non-equi join that "
            "degrades to per-row scans of the broadcast side at scale); "
            "pass allow_bnlj=True only for intentional tiny-side theta-joins"
        )
