"""Plan auditing helpers: make the 100-TB plan properties testable.

SURVEY.md §4 calls out three invariants that are cheap to get wrong and
catastrophic at scale:

  * filters/column pruning must reach the parquet scan
    (PushedFilters / ReadSchema);
  * downstream queries must never deserialize the multi-MB `html`
    binary column;
  * small dimension joins must be broadcast, not shuffled.

These helpers parse `explain('formatted')` output so tests (and CI) can
assert the plan shape instead of eyeballing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def scan_read_schemas(plan: str) -> list[str]:
    """ReadSchema lines of every file scan in the plan."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]


def pushed_filters(plan: str) -> list[str]:
    return [
        line.split("PushedFilters:", 1)[1].strip()
        for line in plan.splitlines()
        if "PushedFilters:" in line
    ]


def assert_column_pruned(df: DataFrame, column: str) -> None:
    """Fail if any scan in df's plan reads `column` (e.g. html)."""
    plan = formatted_plan(df)
    for schema in scan_read_schemas(plan):
        if column in schema:
            raise AssertionError(
                f"scan reads pruned column {column!r}: {schema}"
            )


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    """Fail unless some scan's PushedFilters mentions `fragment`."""
    plan = formatted_plan(df)
    if not any(fragment in pf for pf in pushed_filters(plan)):
        raise AssertionError(
            f"no pushed filter containing {fragment!r}; plan:\n{plan[:2000]}"
        )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"no broadcast join in plan:\n{plan[:2000]}")


def count_nodes(df: DataFrame, node_pattern: str) -> int:
    """Count physical-plan nodes by their detail header '(n) Node'
    (each node appears once in the tree and once as a detail header —
    counting headers avoids double counting)."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(rf"^\(\d+\) (?:{node_pattern})\b", plan, re.M))


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded — those are the cheap kind)."""
    return count_nodes(df, "Exchange")
