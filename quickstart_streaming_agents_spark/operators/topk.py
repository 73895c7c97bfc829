"""Skew-safe per-group top-k.

Beyond-reference scale hardening for the L3/top-k family (reference
semantics: the lab dashboards' "top matches per query" and "top event
types per window", e.g. terraform/lab2-vector-search/main.tf:280-300).

The idiomatic per-group top-k — ``row_number() OVER (PARTITION BY key
ORDER BY …) <= k`` — ships EVERY row of a group to one reducer and sorts
it there. AQE's skew mitigation splits join and aggregate partitions but
never window partitions, so one hot key (a viral event type, a
boilerplate query) serializes a 100 TB job on a single task.

``grouped_topk`` is the exact two-stage fix:

1. salt stage — rank within ``(key, salt)`` where salt =
   ``pmod(xxhash64(order columns…), salt_buckets)``; the hot key's rows
   spread across ``salt_buckets`` reducers and each emits at most k
   candidates. Any group's true top-k survives: a row in the global
   top-k is necessarily in the top-k of its own salt bucket.
2. merge stage — rank within ``key`` over at most ``salt_buckets × k``
   candidates per key: bounded reducer input regardless of group size.

Two shuffles instead of one, but both with bounded per-task state. For
groups far smaller than ``salt_buckets × k`` the classic single-window
form is cheaper — this operator is the path you switch to when key skew
is real (or keep ``salt_buckets`` modest and pay one extra bounded
shuffle as insurance).

Determinism: ties must be broken by the ``order`` columns themselves
(pass a unique tie-break column last, exactly as you would for plain
row_number) — the salt only partitions work, it never affects ranking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
    k: int,
    salt_buckets: int = 64,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Exact top-k rows per ``keys`` group under ``order`` (use
    ``F.col(c).desc()`` etc.), with bounded per-reducer state. Returns the
    input columns plus ``rk`` (1-based rank).

    ``salt_on`` names the columns hashed into the salt (default: every
    input column). The salt only spreads work — any deterministic
    row-level value is correct, and a hash collision merely co-locates
    two rows — but pass ``salt_on`` explicitly when the frame carries
    non-hashable payload columns (xxhash64 rejects map types) or when
    bucket assignment must stay stable as payload columns come and go."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    clash = {"__salt", "__r1", "rk"} & set(df.columns)
    if clash:
        raise ValueError(
            f"grouped_topk uses helper columns {sorted(clash)}; rename them "
            "in the input frame (withColumn would silently overwrite them)"
        )
    salt_cols = salt_on if salt_on is not None else df.columns
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets)
    )
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order)
    stage1 = (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        stage1.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .drop("__salt")
    )
