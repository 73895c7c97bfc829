"""Time-series gap filling — dense bucket scaffold + LOCF interpolation.

Beyond-reference surface (TSDB staple: TimescaleDB's ``time_bucket_gapfill``
+ ``locf``, public semantics): windowed aggregates emit rows only for
buckets that HAVE data, but dashboards/models downstream need a dense,
regular series per key. This operator re-grids each key to every bucket in
its observed [min, max] span and fills value columns by
last-observation-carried-forward.

Spark-first plan, no generator UDF:

1. Per-key span: one aggregate → (key, min_bucket, max_bucket).
2. Scaffold: ``sequence(min, max, step)`` + ``explode`` — the dense bucket
   axis is generated *inside* each task from two longs, so a year of
   5-minute buckets costs 105k rows per key, never a driver loop or a
   cross join against a calendar table.
3. One shuffle: scaffold LEFT JOIN actuals on (key, bucket), then the
   same window trick as the as-of join — ``last(value_struct,
   ignorenulls=True)`` over buckets — carries observations forward
   atomically (all value columns from the same source row).

Cost model at scale: 2 shuffles total (span agg reuses the join's
partitioning at 100 TB via bucketed storage if desired) + per-key window
sort over the DENSE axis — O(span/step) rows per key, the output size
itself. ``is_gap`` marks synthesized rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    keys: list[str],
    bucket_col: str,
    value_cols: list[str],
    step: str = "6 hours",
) -> DataFrame:
    """Dense per-key series: every ``step`` bucket between each key's first
    and last observation, value columns LOCF-filled, ``is_gap`` flag.

    ``bucket_col`` must be a timestamp already aligned to ``step`` (the
    output of ``tumble``'s window_start). Rows per (key, bucket) must be
    unique — aggregate first.
    """
    span = df.groupBy(*keys).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    scaffold = span.select(
        *keys,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))
        ).alias(bucket_col),
    )
    payload = F.struct(*[F.col(c) for c in value_cols])
    actual = df.select(*keys, bucket_col, payload.alias("__obs"))
    joined = scaffold.join(actual, [*keys, bucket_col], "left")

    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.withColumn("__fill", F.last("__obs", ignorenulls=True).over(w))
    return filled.select(
        *keys,
        bucket_col,
        *[F.col(f"__fill.{c}").alias(c) for c in value_cols],
        F.col("__obs").isNull().alias("is_gap"),
    )
