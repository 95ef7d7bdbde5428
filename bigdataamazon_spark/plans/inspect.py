"""Executed-plan introspection without leaving Python.

Pitfalls these helpers encode (each cost a debugging session once):

- Under AQE the executed plan prints ``isFinalPlan=false`` until the
  EXACT DataFrame has been executed — and ``df.count()`` executes a
  DERIVED plan, not ``df``'s. ``final_plan`` collects ``df`` itself.
- Whole-stage-codegen spans print as ``*(n) Operator`` in the plan
  string, not as the word "WholeStageCodegen".
- ``.explain`` truncates FileScan lines, so PushedFilters can be cut
  off mid-list; ``DataFilters`` is the reliable marker when auditing
  pushdown textually.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The executed (physical) plan string WITHOUT running the query.
    Under AQE this is the initial plan (``isFinalPlan=false``); use
    ``final_plan`` for the post-execution shape."""
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """Execute ``df`` (collect, discarding rows) and return the final
    AQE plan — runtime-converted broadcasts, coalesced partitions and
    fused codegen stages included."""
    df.collect()
    return executed_plan(df)


def scan_schemas(plan: str) -> list[list[str]]:
    """Column lists of every file scan, in plan order — the direct
    check that column pruning reached the reader (a 2-column projection
    whose scan reads 11 columns is a bug, whatever the row counts
    say)."""
    return [
        [c.split(":")[0] for c in m.split(",") if c]
        for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    ]


def codegen_span_count(plan: str) -> int:
    """Number of distinct whole-stage-codegen spans (``*(n)`` ids).
    Fewer, wider spans = more of the query fused into generated code;
    a span break in a hot path usually marks a Python/UDF hop or an
    exchange that could be avoided."""
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def plan_summary(plan: str) -> dict[str, int]:
    """Count the plan features that matter at scale. Keys:
    broadcast_hash_joins, sort_merge_joins, nested_loop_joins,
    cartesian_products, exchanges, reused_exchanges, codegen_spans,
    scans."""
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        "exchanges": plan.count("Exchange"),
        "reused_exchanges": plan.count("ReusedExchange"),
        "codegen_spans": codegen_span_count(plan),
        "scans": plan.count("FileScan"),
    }
