"""Skew-mitigation utilities.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on in
session.get_spark): it splits oversized shuffle partitions at runtime.
Salting is the explicit fallback for the cases AQE cannot fix — a single
join key so hot that one logical key exceeds a task (celebrity-user joins,
null-key floods), or deterministic plans where runtime re-planning is off.

``salted_join``: the skewed (big) side gets a deterministic salt in
[0, salt); the other side is replicated once per salt value; the join key
becomes (key, salt), spreading one hot key over ``salt`` tasks. Replication
multiplies the small side by ``salt`` — use only when that side is modest
but above broadcast size (else just broadcast it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the ``skewed`` side.

    The salt is a deterministic hash of the skewed side's full row
    (xxhash64), never rand(): task retries and speculative execution must
    re-derive the same salt or rows duplicate/vanish.

    Joins that preserve unmatched rows of the *replicated* side are
    rejected: each unmatched ``other`` row exists ``salt`` times, so
    right/full outer would emit ``salt`` duplicates of it. Flip the join
    (salt the other side) or dedup downstream instead.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join(how={how!r}): outer joins preserving the replicated "
            f"side duplicate its unmatched rows ×{salt}; allowed: {sorted(allowed)}"
        )
    skewed_cols = [c for c in skewed.columns]
    other_cols = [c for c in other.columns if c not in on]

    # Deterministic (retry-safe) salt from the full row. Caveat: EXACT
    # duplicate rows share a salt and still co-locate — a hot key made of
    # identical rows needs a distinguishing column (dedup first, or add a
    # unique id upstream); rand() would spread them but breaks task retry.
    s = skewed.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in skewed_cols]), F.lit(salt))
    )
    o = other.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    joined = s.join(o, on=on + [SALT], how=how)
    if how.lower().replace("_", "") in ("leftsemi", "leftanti"):
        # semi/anti output carries only the left side's columns
        return joined.select(*skewed_cols)
    return joined.select(*skewed_cols, *other_cols)
