"""Physical-plan introspection — the ".explain and iterate" feedback loop as
code.

The 100 TB posture is enforced, not aspired to: tests/test_plans.py asserts
per-query plan properties (filters reach the parquet scan, small dims
broadcast, top-k plans as WindowGroupLimit/TakeOrderedAndProject, no
accidental cartesian products, bounded shuffle counts). A regression that
turns a broadcast join into a sort-merge join or drops a pushed filter
fails CI here, long before it fails at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (DataFrame.explain only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the scan node advertises PushedFilters containing every
    fragment (empty fragments: any non-empty pushdown)."""
    plan = explain_str(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = ", ".join(m)
    if not fragments:
        return bool(pushed.strip())
    return all(f in pushed for f in fragments)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def has_window_group_limit(df: DataFrame) -> bool:
    return "WindowGroupLimit" in explain_str(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (pre-AQE). Broadcast exchanges are not
    counted — they move dim-sized data, not fact-sized.

    Counted in "simple" mode, where each exchange prints inline as
    ``Exchange hashpartitioning(...)``; formatted mode labels nodes
    ``Exchange (5)`` with the partitioning on a separate Arguments line,
    which this regex would miss entirely (and did, until a query with a
    KNOWN shuffle count measured 0 — keep this in simple mode)."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def single_partition_window_count(df: DataFrame) -> int:
    """Window operators fed by an ``Exchange SinglePartition`` — the global
    ``OVER (ORDER BY ...)`` sort bottleneck (ALL rows through one task).

    Counted in simple mode where the feed chain prints inline as::

        Window [...], [x ASC NULLS FIRST]
        +- Sort [x ASC NULLS FIRST], false, 0
           +- Exchange SinglePartition, ...

    i.e. a ``Window`` whose nearest non-pass-through descendant line is
    the single-partition exchange. All unary pass-through nodes are
    skipped (not just ``Sort`` — ADVICE r6: a ``Project``/``Filter``/AQE
    marker between the Sort and the Exchange previously produced a false
    negative); the walk stops at the first node that can CHANGE the
    feeding partitioning (another exchange, a join, an aggregate, a
    scan). Bounded-grain windows (decile/day/top-k rollups) are allowed
    per-query via the pinned allowlist in
    ``tests/test_plans.py:test_no_data_grain_single_partition_windows`` —
    any NEW query introducing one must be consciously added there."""
    plan = explain_str(df, "simple")
    lines = [ln.strip().lstrip("*+-: ()0123456789") for ln in plan.splitlines()]
    passthrough = (
        "Sort", "Project", "Filter", "AdaptiveSparkPlan", "ColumnarToRow",
        "InputAdapter", "WholeStageCodegen", "CollectMetrics",
    )
    hits = 0
    for i, ln in enumerate(lines):
        if not ln.startswith("Window"):
            continue
        for nxt in lines[i + 1 :]:
            if nxt.startswith(passthrough):
                continue
            if "Exchange SinglePartition" in nxt:
                hits += 1
            break
    return hits


def codegen_coverage(df: DataFrame) -> tuple[int, int]:
    """(wholestage_codegen_spans, total_nodes-ish) — a coarse signal that
    the hot path stays inside generated code."""
    plan = explain_str(df, "simple")
    spans = len(set(re.findall(r"\*\((\d+)\)", plan)))
    nodes = len([ln for ln in plan.splitlines() if ln.strip().startswith(("+-", ":-"))])
    return spans, nodes
