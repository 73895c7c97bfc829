"""Helpers over the executed physical plan string."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-prep) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded)."""
    return len(re.findall(r"Exchange (?:hash|range|Single)", physical_plan(df)))


def assert_no_exchange(df: DataFrame, msg: str = "") -> None:
    plan = physical_plan(df)
    assert "Exchange hashpartitioning" not in plan and \
        "Exchange rangepartitioning" not in plan, msg or plan


def assert_no_row_python(df: DataFrame, msg: str = "") -> None:
    """Python must only appear Arrow-batched (pandas UDF / mapInPandas /
    UDTF); BatchEvalPython = pickled row-at-a-time, banned on hot paths."""
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan, msg or plan


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan (may be truncated
    by Spark's plan renderer for long filter lists)."""
    # Spark's renderer truncates long filter lists mid-entry without a
    # closing bracket, so capture to end of line rather than to "]".
    return re.findall(r"PushedFilters: \[([^\n]*)", physical_plan(df))


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column list actually read by each FileScan (column-pruning check)."""
    out = []
    for m in re.finditer(r"FileScan \w+ \[([^\]]*)\]", physical_plan(df)):
        out.append([c.split("#")[0].strip() for c in m.group(1).split(",") if c.strip()])
    return out
