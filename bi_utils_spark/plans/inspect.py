"""Physical-plan inspection helpers (the engine's explain toolkit).

The 100 TB design rules in this repo are checkable claims, not prose:
filters reach the parquet scan, small dimensions broadcast, bucketed
joins have no Exchange, temporal joins never nest loops. These
helpers turn each claim into an assertion usable from tests and
notebooks (see tests/test_plans.py and README §Scale design).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The final (AQE-resolved where possible) physical plan text."""
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text — scans show PushedFilters/ReadSchema."""
    return df._jdf.queryExecution().explainString(  # noqa: SLF001
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
            "formatted"
        )
    )


def scan_pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists appearing in the plan's file scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the column-pruning proof."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", formatted_plan(df))


def join_kinds(df: DataFrame) -> dict[str, int]:
    """Count of each physical join operator in the executed plan."""
    plan = executed_plan(df)
    kinds = [
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ]
    return {k: plan.count(k) for k in kinds if plan.count(k)}


def num_exchanges(df: DataFrame) -> int:
    """Shuffle (Exchange) operator count — the scale cost driver."""
    return len(re.findall(r"\bExchange\b", executed_plan(df)))


def assert_no_nested_loop(df: DataFrame) -> None:
    kinds = join_kinds(df)
    bad = {k: v for k, v in kinds.items() if k in ("BroadcastNestedLoopJoin", "CartesianProduct")}
    if bad:
        raise AssertionError(f"nested-loop join in plan: {bad}\n{executed_plan(df)}")


def _walk(node):
    yield node
    # AdaptiveSparkPlanExec hides its subtree from children(); descend
    # through its current/initial plan instead
    for probe in ("initialPlan", "inputPlan"):
        if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            try:
                yield from _walk(getattr(node, probe)())
                return
            except Exception:  # noqa: BLE001
                continue
    it = node.children().iterator()
    while it.hasNext():
        yield from _walk(it.next())


def global_window_count(df: DataFrame) -> int:
    """Number of physical Window operators with an EMPTY partition
    spec — each one moves the whole input to a single task (the
    `WindowExec: No Partition Defined` warning), the canonical
    100 TB scale-killer."""
    plan = df._jdf.queryExecution().executedPlan()  # noqa: SLF001
    n = 0
    for node in _walk(plan):
        name = node.getClass().getSimpleName()
        if "Window" in name and hasattr(node, "partitionSpec"):
            try:
                if node.partitionSpec().isEmpty():
                    n += 1
            except Exception:  # noqa: BLE001 — non-window lookalike
                continue
    return n


def assert_no_global_window(df: DataFrame) -> None:
    """Assert the plan contains no single-partition (unpartitioned)
    window — every window sort must be parallel."""
    n = global_window_count(df)
    if n:
        raise AssertionError(
            f"{n} unpartitioned Window operator(s) in plan "
            f"(whole input in one task):\n{executed_plan(df)}"
        )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    pushed = scan_pushed_filters(df)
    if not any(fragment in p for p in pushed):
        raise AssertionError(
            f"no pushed filter containing {fragment!r}; pushed={pushed}"
        )


def assert_pruned_scan(df: DataFrame, table_cols: int, max_read_cols: int) -> None:
    """Assert at least one scan reads ≤ max_read_cols of table_cols."""
    for schema in scan_read_schemas(df):
        n = schema.count(":")
        if n <= max_read_cols:
            return
    raise AssertionError(
        f"no scan pruned to ≤{max_read_cols}/{table_cols} columns; "
        f"schemas={scan_read_schemas(df)}"
    )
