"""Plan inspection: assert the physical plan is the one a 100 TB run
needs (SURVEY.md §4 — the reference had no optimizer; here the
optimizer is Catalyst and OUR job is to verify it picked the intended
strategy and to keep plans inside whole-stage codegen).

Used by tests (tests/test_plans.py) to pin:
- broadcast joins on small dims (BroadcastHashJoin present),
- parquet filter/column pushdown (PushedFilters / ReadSchema),
- absence of row-at-a-time Python evaluation (BatchEvalPython) on
  JVM-only operators,
- shuffle (Exchange) counts, so a refactor can't silently add one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the plan (AQE may later coalesce
    them, but a plan with fewer Exchanges is strictly better)."""
    plan = physical_plan(df)
    return sum(
        line.strip().startswith(("Exchange", "+- Exchange", ":- Exchange"))
        or "Exchange hashpartitioning" in line
        or "Exchange rangepartitioning" in line
        for line in plan.splitlines()
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node ('' if none)."""
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        if "PushedFilters" in line:
            out.append(line.strip())
    return "\n".join(out)


def read_schema(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(l.strip() for l in plan.splitlines() if "ReadSchema" in l)


def uses_python_row_eval(df: DataFrame) -> bool:
    """True if the plan fell out of the JVM into row-at-a-time Python
    (BatchEvalPython) — the slow path we ban on hot operators
    (ArrowEvalPython / MapInPandas are the sanctioned Python paths)."""
    return "BatchEvalPython" in physical_plan(df)
