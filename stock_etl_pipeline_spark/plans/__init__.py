"""Physical-plan introspection: the feedback loop for scale tuning.

The engine's performance doctrine (README / SURVEY.md §4) is enforced by
looking at plans, not guessing: filters must reach the parquet scan,
projections must prune the read schema, dimensions must broadcast, and
shuffles must be counted and justified. These helpers expose those
properties programmatically — tests/test_plans.py locks them in as
regressions, and operators use them during development via
``explain_formatted``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string (what ``df.explain("formatted")``
    prints)."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def count_nodes(plan: str, operator: str) -> int:
    """Number of occurrences of a physical operator node in the plan tree."""
    return len(re.findall(rf"\(\d+\)\s+{re.escape(operator)}\b", plan))


def n_shuffles(plan_or_df: str | DataFrame) -> int:
    plan = plan_or_df if isinstance(plan_or_df, str) else explain_formatted(plan_or_df)
    return count_nodes(plan, "Exchange")


def pushed_filters(plan_or_df: str | DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's scans."""
    plan = plan_or_df if isinstance(plan_or_df, str) else explain_formatted(plan_or_df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(f.strip() for f in m.group(1).split(","))
    return out


def read_schemas(plan_or_df: str | DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning check)."""
    plan = plan_or_df if isinstance(plan_or_df, str) else explain_formatted(plan_or_df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        body = m.group(1)
        out.append({c.split(":")[0].strip() for c in body.split(",") if ":" in c})
    return out


@dataclass
class PlanSummary:
    shuffles: int
    broadcast_joins: int
    sortmerge_joins: int
    cartesian_products: int
    windows: int
    pushed_filters: list[str]
    read_schemas: list[set[str]]

    def scan_bytes_bounded(self) -> bool:
        """True when every scan prunes to an explicit column subset."""
        return all(len(s) > 0 for s in self.read_schemas)


def summarize(df: DataFrame) -> PlanSummary:
    plan = explain_formatted(df)
    return PlanSummary(
        shuffles=count_nodes(plan, "Exchange"),
        broadcast_joins=count_nodes(plan, "BroadcastHashJoin"),
        sortmerge_joins=count_nodes(plan, "SortMergeJoin"),
        cartesian_products=count_nodes(plan, "CartesianProduct")
        + count_nodes(plan, "BroadcastNestedLoopJoin"),
        windows=count_nodes(plan, "Window"),
        pushed_filters=pushed_filters(plan),
        read_schemas=read_schemas(plan),
    )
