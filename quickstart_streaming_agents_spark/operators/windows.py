"""Tumbling-window aggregation with the reference's column contract.

The reference uses the Flink ``TUMBLE`` table-valued function and groups by
``window_start, window_end, window_time`` (LAB3-Walkthrough.md:99-112,
LAB4-Walkthrough.md:79-103 in /root/reference). Spark's ``window()`` column
produces the same buckets; ``window_time`` is Flink's end-exclusive
``window_end - 1 ms`` rowtime attribute, reproduced here exactly.

Scale note: ``groupBy(window(...), key)`` is a single hash aggregation with
map-side partial aggregation — one shuffle keyed on (window, key). At 100 TB
this is the right shape: state per (window × key) is tiny relative to input,
and AQE coalesces/splits post-shuffle partitions as needed. No per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumble(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
    window_time: bool = True,
) -> DataFrame:
    """Event-time tumbling-window aggregate.

    Returns columns ``window_start, window_end[, window_time], *keys, *aggs``.
    ``watermark`` (e.g. ``"5 seconds"``) enables append-mode emission in
    streaming; harmless in batch.
    """
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), duration)
    out = (
        df.groupBy(win.alias("window"), *[F.col(k) for k in keys])
        .agg(*aggs)
    )
    cols = [
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
    ]
    if window_time:
        # Flink: window_time = window_end - 1ms (SURVEY §2.4 A1)
        cols.append((F.col("window.end") - F.expr("INTERVAL 1 MILLISECOND")).alias("window_time"))
    keep = [c for c in out.columns if c != "window"]
    return out.select(*cols, *keep)
