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


# Operators a global-window's partition chain may legitimately pass
# through between the Window and its SinglePartition shuffle.
_WINDOW_CHAIN_OPS = ("Sort", "Window", "WindowGroupLimit", "Project",
                     "Filter")


def single_partition_windows(plan_text: str) -> list[str]:
    """Window operators fed by an ``Exchange SinglePartition``.

    This is the one plan shape that cannot scale: an unpartitioned
    window spec (global NTILE / rank / cumulative sum) pulls the whole
    frame through one task. Formatted explain splits the evidence
    across sections — the tree shows ``Window (9)`` above
    ``Exchange (7)`` and the detail block shows ``(7) Exchange`` /
    ``Arguments: SinglePartition`` — so the r06 single-regex detector
    matched nothing, ever (ADVICE r06). This walks the structure:

    1. collect ids of Exchange blocks whose Arguments say
       SinglePartition (the ``[^\\n]+`` keeps the match inside one
       detail block — blocks are blank-line separated);
    2. in each tree section, walk each such Exchange's parent chain
       (nearest preceding line with smaller indent) through
       Sort/Project/Filter; if it reaches a Window, that window is
       global.

    Returns the list of flagged Window tree labels (e.g. ``Window
    (9)``), empty when the plan has no global window.
    """
    sp_ids = {
        m.group(1)
        for m in re.finditer(
            r"\((\d+)\) Exchange\n(?:[^\n]+\n)*?Arguments: SinglePartition",
            plan_text,
        )
    }
    if not sp_ids:
        return []
    # Tree sections: contiguous runs of "indent Op (id)" lines (the
    # main plan and each subquery print their own tree).
    line_re = re.compile(r"^([ +\-:*|]*)([A-Za-z][\w ]*?)\s+\((\d+)\)\s*$")
    sections: list[list[tuple[int, str, str]]] = []
    cur: list[tuple[int, str, str]] = []
    for line in plan_text.splitlines():
        m = line_re.match(line)
        if m:
            cur.append((len(m.group(1)), m.group(2).strip(), m.group(3)))
        elif cur:
            sections.append(cur)
            cur = []
    if cur:
        sections.append(cur)
    flagged: list[str] = []
    for tree in sections:
        for i, (indent, op, oid) in enumerate(tree):
            if oid not in sp_ids:
                continue
            walk = indent
            for j in range(i - 1, -1, -1):
                p_indent, p_op, p_id = tree[j]
                if p_indent >= walk:
                    continue  # sibling subtree, not an ancestor
                if p_op.startswith("Window"):
                    flagged.append(f"{p_op} ({p_id})")
                    break
                if not p_op.startswith(_WINDOW_CHAIN_OPS):
                    break  # chain broken by an agg/join/etc.
                walk = p_indent
    return flagged
