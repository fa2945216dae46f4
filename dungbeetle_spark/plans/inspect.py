"""Physical-plan introspection and assertions.

The engine's scale story rests on claims about plans, not code: small
dims broadcast, filters reach the parquet scan, scans prune columns,
aggregates combine map-side, shuffles are counted and justified.
These helpers turn each claim into something a test can assert, so a
plan regression (a broadcast silently becoming a shuffle join after a
refactor, a filter stuck above a UDF) fails CI instead of surfacing
as a 100 TB incident.

Reference parity note: the reference delegates all planning to its
source databases (SURVEY.md §4 — "no query optimizer and no execution
engine"); in this rebuild Catalyst owns the plan, and this module is
how we hold Catalyst's output to the standard the docstrings claim.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``explain('formatted')`` text, captured as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def shuffle_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (hash/range/round-robin
    partitioning), broadcasts excluded. Every one is a full data
    shuffle at scale — queries should know their number and defend
    it."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\)\s+Exchange\b", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters lists that reached a source scan."""
    plan = formatted_plan(df)
    return [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m]


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the column-pruning evidence."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (\S+)", plan)


def final_plan(df: DataFrame) -> str:
    """Execute the DataFrame and return the finalized adaptive plan.

    Under AQE the pre-execution explain is a skeleton (no codegen ids,
    join strategies still revisable); properties of the plan that
    actually ran must be read from ``executedPlan`` after an action.
    """
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def codegen_stages(df: DataFrame) -> int:
    """Distinct WholeStageCodegen spans in the executed plan. Each
    span is one fused JVM loop; plan fragments outside any span run
    interpreted (or in Python). Executes the DataFrame."""
    plan = final_plan(df)
    # codegen'd operators print with a *(N) stage prefix
    final = plan.split("== Initial Plan ==")[0]
    return len(set(re.findall(r"\*\((\d+)\)", final)))


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when the aggregate runs map-side partials before the
    shuffle (an aggregate operator appears on both sides of the
    Exchange)."""
    plan = simple_plan(df)
    first_agg = min(
        (i for i in (plan.find("HashAggregate"), plan.find("ObjectHashAggregate")) if i >= 0),
        default=-1,
    )
    if first_agg < 0:
        return False
    ex = plan.find("Exchange", first_agg)
    if ex < 0:
        return False
    return "HashAggregate" in plan[ex:]
