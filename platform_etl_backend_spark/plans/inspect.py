"""Physical-plan introspection: the guard rails that keep operators honest
at scale.

Rather than hoping Catalyst did the right thing, operators and tests assert
it: filters reached the parquet scan (PushedFilters), small dims broadcast
(BroadcastHashJoin), no accidental cartesian products, and hot expressions
stay inside whole-stage codegen. A plan regression then fails CI instead of
becoming a 100TB incident.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the physical plan (lower bound on shuffles)."""
    return len(re.findall(r"Exchange (?:hash|range|SinglePartition)",
                          explain_str(df, "simple")))


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = explain_str(df, "simple")
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= at_least, f"expected >= {at_least} broadcast joins, saw {n}:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, f"unexpected cartesian product:\n{plan}"


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the scan (PushedFilters: [...])."""
    plan = explain_str(df, "formatted")
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert fragment in pushed, (
        f"filter '{fragment}' not pushed to scan; PushedFilters lines:\n{pushed}\n"
        f"full plan:\n{plan[:4000]}"
    )


def assert_wholestage_codegen(df: DataFrame, at_least: int = 1) -> None:
    """Count generated WholeStageCodegen subtrees (AQE-safe: the simple plan
    hides codegen stars while isFinalPlan=false, so use codegen mode)."""
    plan = explain_str(df, "codegen")
    n = len(re.findall(r"WholeStageCodegen subtree", plan))
    assert n >= at_least, f"expected >= {at_least} codegen stages, saw {n}:\n{plan[:3000]}"
