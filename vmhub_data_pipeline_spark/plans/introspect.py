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


def codegen_coverage(df: DataFrame) -> tuple[int, int]:
    """(wholestage_codegen_spans, total_nodes-ish) — a coarse signal that
    the hot path stays inside generated code."""
    plan = explain_str(df, "simple")
    spans = len(set(re.findall(r"\*\((\d+)\)", plan)))
    nodes = len([ln for ln in plan.splitlines() if ln.strip().startswith(("+-", ":-"))])
    return spans, nodes
