"""As-of (point-in-time) join — the temporal-enrichment operator.

Beyond-reference surface (the reference's labs stop at interval joins;
LAB3-Walkthrough.md:293-320): for every left ("probe") row, attach the
single latest right ("build") row with the same keys whose timestamp is
``<=`` (or ``<`` with ``strict=True``) the probe timestamp — market-data
quote attachment, session attribution, slowly-changing-dimension lookup.

Spark-first plan — union + window fill, NOT a range join:

1. Tag both inputs and union them into one relation that carries the probe
   columns (null on build rows) and one ``struct`` of the carried build
   columns (null on probe rows).
2. One shuffle: ``Window.partitionBy(keys).orderBy(ts, side, tiebreak)``
   with ``last(payload_struct, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` — each probe row picks
   up the most recent preceding build struct in pure JVM window code.
3. Filter back to probe rows and unpack the struct.

Why this shape at 100 TB: a naive ``l JOIN r ON key AND r.ts <= l.ts``
explodes to O(|matches|) intermediate rows before the per-row max is
taken; the union plan moves each input row exactly once (single exchange
on the join keys, sort within partitions) and holds O(1) state per row.
The build payload is filled as ONE struct so the matched row is atomic —
filling columns independently could mix values from different build rows
when a carried column is null.

Ties on the build timestamp are resolved by ``right_tiebreak`` (greatest
wins), making results deterministic and exactly replayable by DuckDB's
native ``ASOF LEFT JOIN`` over a (key, ts)-deduplicated build side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    strict: bool = False,
    tolerance_seconds: float | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: left columns + ``{right_col}{suffix}`` columns from
    the latest matching build row (null when no build row qualifies).

    ``right_cols`` defaults to every right column except the keys; the
    build timestamp is always carried (as ``{right_ts}{suffix}``) so
    callers can see *when* the matched row happened. ``tolerance_seconds``
    additionally voids matches older than the given horizon — the bounded-
    state knob (in streaming terms: the watermark delay of the build side).
    """
    keys = list(on)
    src_cols = right.columns if right_cols is None else right_cols
    carried = [c for c in src_cols if c not in keys]
    if right_ts not in carried:
        carried = [right_ts, *carried]
    if right_tiebreak is not None and right_tiebreak not in carried:
        carried = [*carried, right_tiebreak]

    left_only = [c for c in left.columns if c not in keys and c != left_ts]
    payload_t = right.select(*[F.col(c) for c in carried]).schema
    probe_ord, build_ord = (0, 1) if strict else (1, 0)

    any_null_key = F.lit(False)
    for kcol in keys:
        any_null_key = any_null_key | F.col(kcol).isNull()
    null_safe_keys = True  # NULL keys bypass the window (SQL semantics)
    left_matched = left.filter(~any_null_key)
    right = right.filter(~any_null_key)

    probe = left_matched.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__probe"),
        F.lit(probe_ord).alias("__ord"),
        *[F.col(c) for c in left_only],
        F.lit(None).cast(payload_t).alias("__payload"),
    )
    build = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__probe"),
        F.lit(build_ord).alias("__ord"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        F.struct(*[F.col(c) for c in carried]).alias("__payload"),
    )

    order: list[Column] = [F.col("__ts").asc(), F.col("__ord").asc()]
    if right_tiebreak is not None:
        order.append(F.col(f"__payload.{right_tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = probe.unionByName(build).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )

    matched_ts = F.col(f"__match.{right_ts}")
    ok = matched_ts.isNotNull()
    if tolerance_seconds is not None:
        age = (
            F.unix_micros(F.col("__ts")) - F.unix_micros(matched_ts)
        ) / F.lit(1_000_000.0)
        ok = ok & (age <= F.lit(float(tolerance_seconds)))

    out_cols = [F.col("__ts").alias(left_ts) if c == left_ts else F.col(c)
                for c in left.columns]
    out_cols += [
        F.when(ok, F.col(f"__match.{c}")).alias(f"{c}{suffix}") for c in carried
    ]
    matched_rows = filled.filter(F.col("__probe") == 1).select(*out_cols)
    if not null_safe_keys:
        return matched_rows
    # SQL equality never matches NULL keys, but Window.partitionBy groups
    # them together — route NULL-key probe rows around the window with a
    # null payload so semantics (and the DuckDB ASOF oracle) agree
    null_probe = left.filter(any_null_key).select(
        *left.columns,
        *[
            F.lit(None).cast(payload_t[c].dataType).alias(f"{c}{suffix}")
            for c in carried
        ],
    )
    return matched_rows.unionByName(null_probe)
