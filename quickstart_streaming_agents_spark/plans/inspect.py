"""Helpers over the executed physical plan string."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-prep) physical plan as text.

    After an action, an AdaptiveSparkPlan renders BOTH its final and its
    initial plan — keeping the initial section would double-count
    exchanges and resurrect operators AQE eliminated."""
    return (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded).

    Spark renders the partitioning CamelCase for round-robin
    (``Exchange RoundRobinPartitioning(n)``) and lowercase for keyed
    (``hashpartitioning``/``rangepartitioning``/``SinglePartition``);
    the r14 audit found the old all-lowercase pattern silently never
    counted round-robin exchanges."""
    return len(
        re.findall(
            r"Exchange (?:hash|range|RoundRobin|Single)", physical_plan(df)
        )
    )


def assert_no_exchange(df: DataFrame, msg: str = "") -> None:
    assert count_exchanges(df) == 0, msg or physical_plan(df)


def count_keyed_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges excluding round-robin. Hash/range/single
    partitioning move rows BY KEY — the scale-relevant reshuffles the
    plan pins guard against. The only round-robin producer in this
    engine is ``sources.parquet.spread_scan``, the guarded ids-only
    spread for parallelism-starved single-row-group fixture scans (a
    no-op at production split counts); pins on Python-synthesis queries
    use this counter plus an explicit round-robin budget so a keyed
    corpus reshuffle still fails loudly."""
    return len(
        re.findall(r"Exchange (?:hash|range|Single)", physical_plan(df))
    )


def count_roundrobin_exchanges(df: DataFrame) -> int:
    return len(re.findall(r"Exchange RoundRobin", physical_plan(df)))


def assert_no_row_python(df: DataFrame, msg: str = "") -> None:
    """Python must only appear Arrow-batched (pandas UDF / mapInPandas /
    UDTF); BatchEvalPython = pickled row-at-a-time, banned on hot paths."""
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan, msg or plan


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan (may be truncated
    by Spark's plan renderer for long filter lists)."""
    # Capture up to the closing bracket when present; Spark's renderer
    # can also truncate long lists mid-entry without one, so fall back to
    # end-of-line minus any trailing ", ReadSchema: ..." junk.
    out = []
    for m in re.findall(r"PushedFilters: \[([^\n]*)", physical_plan(df)):
        m = m.split("], ReadSchema")[0].rstrip("]")
        out.append(m)
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column list actually read by each FileScan (column-pruning check)."""
    out = []
    for m in re.finditer(r"FileScan \w+ \[([^\]]*)\]", physical_plan(df)):
        out.append([c.split("#")[0].strip() for c in m.group(1).split(",") if c.strip()])
    return out
