"""Physical-plan inspection helpers (scale hygiene).

The 100 TB checklist from SURVEY.md §4 / the build brief: filters reach the
parquet scan (PushedFilters), scans read only needed columns (ReadSchema),
dim joins broadcast, aggregations are partial (map-side combine), and
nothing drops into row-at-a-time Python in the hot path. tests/test_plans.py
asserts these properties for the headline queries.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))


def plan_ops(df: DataFrame) -> list[str]:
    """Physical operator names, one per node, parsed from the formatted
    plan's numbered details section (exact names — 'Exchange' does not
    match 'BroadcastExchange')."""
    return re.findall(r"^\(\d+\) (\w+)", formatted_plan(df), re.MULTILINE)


def count_ops(df: DataFrame, op: str) -> int:
    return sum(1 for o in plan_ops(df) if o == op)


def partitionless_windows(df: DataFrame) -> int:
    """Count Window nodes with an EMPTY partition spec — the plan shape
    Spark itself warns about (`WindowExec: No Partition Defined ...
    serious performance degradation`): the whole frame funnels through
    one task. In the formatted details section a Window's Arguments are
    `[exprs], [partitionSpec], [orderSpec]` with EMPTY specs omitted
    (and constant partition keys folded away), so the probe must
    disambiguate the two-group case by content:
      1 group               → global unordered (grand-total) window;
      2 groups, last ASC/DESC → global ORDERED window (the sort-merge
                                single reducer — the worst shape);
      2 groups, no ASC/DESC → partitioned, unordered — fine;
      3 groups              → partitioned + ordered — fine."""
    plan = formatted_plan(df)
    wins = re.findall(r"^\(\d+\) Window\n(?:.+\n)*?Arguments: (.+)$", plan, re.MULTILINE)
    n = 0
    for w in wins:
        seps = w.count("], [")
        if seps == 0:
            n += 1
        elif seps == 1:
            last = w.rsplit("], [", 1)[1]
            if " ASC" in last or " DESC" in last:
                n += 1
    return n


def uses_python_eval(df: DataFrame) -> bool:
    """True if the plan row-trips through Python (BatchEvalPython) or Arrow
    UDF eval — forbidden in every operator except the multimodal decode
    stub (which uses MapInPandas by design)."""
    p = formatted_plan(df)
    return "BatchEvalPython" in p or "ArrowEvalPython" in p
