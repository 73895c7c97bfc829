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


def cumulate(
    df: DataFrame,
    ts_col: str,
    step: str,
    size: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
    window_time: bool = True,
) -> DataFrame:
    """Flink CUMULATE-TVF aggregate on the DataFrame surface (the SQL
    script path derives the same plan in script.rewrite_cumulate).

    Rows land in every growing window of their ``size`` bucket whose end
    is strictly after the row's timestamp: window k of bucket S spans
    [S, S + k·step], k = 1..size/step. Implementation: one ``window(ts,
    size)`` bucket + an ``explode(sequence(...))`` of the cumulative ends
    the row belongs to, then a single keyed aggregation — fan-out is
    size/step rows at most, map-side, before the one shuffle.

    Returns ``window_start, window_end[, window_time], *keys, *aggs``.

    Streaming: the explode drops the ``ts_col`` event-time attribute,
    so the watermark is RE-DECLARED on the exploded ``window_end``
    column instead, with delay ``watermark + size``. That bound is what
    makes append mode correct: an event at ``ts`` contributes rows with
    ``window_end ≤ ts + size``, so ``max(window_end) ≤ max(ts) + size``
    and the derived watermark ``max(window_end) − (delay + size)`` never
    runs ahead of the true event-time watermark ``max(ts) − delay`` —
    no cumulate window is finalized before every ``≤ delay``-late event
    that belongs to it can still arrive. The cost is emission lag (a
    window may close up to ``size`` later than its tumble equivalent)
    and per-row fan-out of ``size/step`` state entries — the documented
    price of the TVF. Never hit by the reference corpus (labs 1-4 use
    TUMBLE exclusively): beyond-reference surface, SURVEY §2 ST7.
    """
    ms = {"millisecond": 1, "milliseconds": 1,
          "second": 1000, "seconds": 1000, "minute": 60_000,
          "minutes": 60_000, "hour": 3_600_000, "hours": 3_600_000,
          "day": 86_400_000, "days": 86_400_000,
          "week": 604_800_000, "weeks": 604_800_000}

    def _to_ms(spec: str) -> int:
        # accept every interval string withWatermark accepts on this
        # surface: compound specs ("1 minute 30 seconds") sum their
        # "<n> <unit>" pairs
        parts = spec.split()
        if len(parts) % 2:
            raise ValueError(f"bad interval spec {spec!r}")
        total = 0
        for i in range(0, len(parts), 2):
            unit = parts[i + 1].lower()
            if unit not in ms:
                raise ValueError(
                    f"unsupported interval unit {parts[i + 1]!r} in {spec!r}"
                )
            total += int(parts[i]) * ms[unit]
        return total

    if _to_ms(size) % _to_ms(step):
        raise ValueError(
            f"CUMULATE size must be a multiple of step ({size!r} vs {step!r})"
        )
    if df.isStreaming and watermark is None:
        raise ValueError(
            "streaming cumulate requires a watermark (append-mode "
            "aggregation cannot finalize windows without one)"
        )
    step_expr = f"INTERVAL {step}"
    if watermark is not None and not df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    bucketed = df.withColumn("__w", F.window(F.col(ts_col), size))
    first_end = F.expr(
        f"timestamp_millis(unix_millis(__w.start) + "
        f"(CAST(floor((unix_millis({ts_col}) - unix_millis(__w.start)) / "
        f"(unix_millis(timestamp_millis(0) + {step_expr}))) AS BIGINT) + 1) * "
        f"unix_millis(timestamp_millis(0) + {step_expr}))"
    )
    exploded = bucketed.withColumn(
        "window_end",
        F.explode(F.sequence(first_end, F.col("__w.end"), F.expr(step_expr))),
    )
    if df.isStreaming:
        delay_ms = _to_ms(watermark) + _to_ms(size)
        exploded = exploded.withWatermark(
            "window_end", f"{delay_ms} milliseconds"
        )
    out = (
        exploded.groupBy(
            F.col("__w.start").alias("window_start"),
            "window_end",
            *[F.col(k) for k in keys],
        ).agg(*aggs)
    )
    cols = [F.col("window_start"), F.col("window_end")]
    if window_time:
        cols.append(
            (F.col("window_end") - F.expr("INTERVAL 1 MILLISECOND")).alias("window_time")
        )
    keep = [c for c in out.columns if c not in ("window_start", "window_end")]
    return out.select(*cols, *keep)
