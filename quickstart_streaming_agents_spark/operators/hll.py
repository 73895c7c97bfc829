"""HyperLogLog cardinality sketch (Flajolet et al. 2007) with
EXACT-INTEGER registers — the distinct-count sibling of the count-min
frequency tier (operators/cms.py).

Beyond-reference surface: the reference's dashboards count distinct
keys exactly; a 100 TB stream needs a distinct-count tier whose state
does not grow with cardinality. Spark's own ``approx_count_distinct``
IS HyperLogLog++, but its binary sketch is opaque — no SQL oracle can
replay it and no other engine can merge it. This operator materializes
the registers themselves as rows:

* hash — the repo's deterministic md5→60-bit integer
  (``('0x'||substr(md5(v),1,15))::UBIGINT``, the cms.py/sampling.py
  construction), so DuckDB replays every register bit-for-bit;
* ``bucket = h % m`` (m = 2^p registers), ``w = h // m`` (a 60−p bit
  field), ``rank = (60−p) − bit_length(w) + 1`` — the leading-zero
  count via the repo's no-libm ``length(bin(w))`` idiom
  (key_skew_histogram, afp buckets), with ``w = 0 → rank = 61−p``;
* register value = ``max(rank)`` per bucket — ONE bounded aggregate
  (≤ m distinct keys per stratum, partial agg collapses map-side, the
  shuffle carries ≤ m rows per task at any corpus size);
* the harmonic-mean numerator ``Σ 2^(scale − r)`` with scale = 61−p
  (absent buckets contribute ``2^scale``) is an exact BIGINT, and the
  raw HLL estimate ``alpha·m²·2^scale / num`` is ONE IEEE division of
  that integer against a shared decimal literal — bit-identical in
  every engine (the quality_classifier r9 arithmetic discipline).

Registers are MERGEABLE: union of two sketches = max(rank) per bucket,
so shard/stream/day-partition sketches combine exactly (pinned in
tests/test_sketches.py). The small-range linear-counting correction
needs ``ln`` (libm, not bit-stable cross-engine) and is deliberately
NOT part of the hash-checked surface; callers that want it apply
``m·ln(m/V)`` to the emitted ``zero_registers`` column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60-bit md5 hash field; rank lives in the (60 - p)-bit remainder
_HASH_BITS = 60


def hll_alpha(m: int) -> float:
    """The standard HLL bias constant for m ≥ 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def _hash60(value: Column, tag: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(tag), value)), 1, 15),
        16,
        10,
    ).cast("long")


def hll_rank(value: Column, p: int, tag: str = "hll-v1") -> tuple[Column, Column]:
    """(bucket, rank) for one value: bucket = low p bits, rank =
    leading-zero count of the remaining (60−p)-bit field + 1."""
    m = 1 << p
    h = _hash60(value, tag)
    bucket = (h % m).cast("int")
    # exact bit shift, NOT h/m: double division loses bits past 2^53
    w = F.shiftright(h, p)
    field = _HASH_BITS - p
    rank = (
        F.when(w == 0, F.lit(field + 1))
        .otherwise(F.lit(field) - F.length(F.bin(w)) + 1)
        .cast("int")
    )
    return bucket, rank


def hll_registers(
    df: DataFrame,
    value_col: str,
    strata: list[str] | None = None,
    p: int = 8,
    tag: str = "hll-v1",
) -> DataFrame:
    """Per-stratum register table ``(*strata, bucket, r)`` — at most
    ``2^p`` rows per stratum, one bounded aggregate. NULL values are
    skipped (they are not elements of the multiset)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    strata = strata or []
    bucket, rank = hll_rank(F.col(value_col), p, tag)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*strata, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*strata, "bucket")
        .agg(F.max("rank").alias("r"))
    )


def hll_merge(registers: DataFrame, strata: list[str] | None = None) -> DataFrame:
    """Union of sketches: max(r) per (strata, bucket). Exact — merging
    shard-level sketches equals sketching the concatenated shards."""
    strata = strata or []
    return registers.groupBy(*strata, "bucket").agg(F.max("r").alias("r"))


def hll_estimate(
    registers: DataFrame,
    strata: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """Collapse a register table to one row per stratum:
    ``(*strata, present_registers, zero_registers, harmonic_num,
    estimate)``.

    ``harmonic_num = Σ 2^(scale − r) + zero_registers·2^scale`` with
    ``scale = 61 − p`` is an exact BIGINT (ranks span [1, 61−p], so
    every term's exponent lands in [0, scale−1] and the sum is
    ≤ m·2^scale = 2^61 < 2^63), and ``estimate = ALPHA_LITERAL /
    harmonic_num`` where the literal ``alpha·m²·2^scale`` is baked
    once — a single IEEE division, bit-identical in every engine."""
    strata = strata or []
    m = 1 << p
    scale = _HASH_BITS - p + 1  # max rank, so scale - r >= 0 always
    agg = registers.groupBy(*strata).agg(
        F.count("*").cast("long").alias("present_registers"),
        # SQL form: the DataFrame-API shiftleft only takes a literal
        # shift amount, but 2^(scale−r) needs a per-row exponent
        F.sum(F.expr(f"shiftleft(1L, {scale} - r)"))
        .cast("long")
        .alias("__present_num"),
        F.max("bucket").alias("__max_bucket"),
        F.max("r").alias("__max_r"),
    )
    # ADVICE r10: a register table built at a different p than the one
    # passed here silently yields wrong zero_registers/harmonic_num —
    # including NEGATIVE shift amounts when the build p was larger. The
    # maxima come free in the same aggregate; fail loudly on mismatch.
    consistent = F.assert_true(
        (F.col("__max_bucket") < F.lit(m)) & (F.col("__max_r") <= F.lit(scale)),
        F.lit(
            f"hll_estimate: register table inconsistent with p={p} "
            f"(expected bucket < {m} and r <= {scale}) — was it built "
            f"with a different p?"
        ),
    )
    agg = agg.withColumn(
        "__present_num",
        F.col("__present_num") + F.coalesce(consistent.cast("long"), F.lit(0)),
    )
    zero = (F.lit(m).cast("long") - F.col("present_registers")).alias(
        "zero_registers"
    )
    num = (
        F.col("__present_num")
        + (F.lit(m) - F.col("present_registers"))
        * F.lit(1 << scale).cast("long")
    ).cast("long")
    alpha_num = hll_alpha(m) * m * m * float(1 << scale)
    return agg.select(
        *strata,
        "present_registers",
        zero,
        num.alias("harmonic_num"),
        (F.lit(alpha_num) / num.cast("double")).alias("estimate"),
    )
