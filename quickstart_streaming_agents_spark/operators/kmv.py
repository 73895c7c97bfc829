"""k-mins / one-permutation MinHash sketch over DISTINCT values —
the bounded sibling of the HLL register tier (operators/hll.py).

Beyond-reference surface: three curation questions share one sketch —
"how many distinct values?" (cardinality), "give me a uniform sample of
the DISTINCT values" (bottom-hash sampling: dedup-fair, unlike row
sampling which over-represents hot values), and "how much do these two
corpora overlap?" (MinHash Jaccard between strata — the dataset-overlap
audit run before mixing training sources). The k-mins construction
(Flajolet–Martin 1985 size estimation; Cohen 1997; the bucketed form is
one-permutation hashing, Li et al. 2012) answers all three from ONE
bounded aggregate:

* hash — the repo's deterministic md5→60-bit integer (the hll/cms
  construction), so a SQL oracle replays every register bit-for-bit;
* ``bucket = h % k``; per (stratum, bucket) keep ``min(h)`` and the
  value attaining it (``min_by`` — the sample);
* state is BOUNDED at k rows per stratum at any corpus size, collapses
  map-side (partial min), and is MERGEABLE: union of sketches = min per
  bucket, so shard/day sketches combine exactly;
* cardinality: each bucket sees ~n/k distinct uniform hashes, so
  ``E[min] ≈ R/(n/k + 1)`` with R = 2^60; summing exact BIGINT minima
  (empty buckets contribute R) gives ``n̂ = k²·R / Σmin − k`` — ONE
  IEEE division of exact integers (the hll/classifier discipline);
* overlap: for strata A, B the probability their bucket minima agree is
  ≈ Jaccard(A, B) (MinHash), so matching-bucket COUNTS are exact
  integers and the estimate is again one division.

100 TB shape: the only shuffle carries ≤ k rows per stratum per map
task (partial aggregation collapses duplicates and non-minimal hashes
map-side); the pairwise overlap join runs on |strata|·k rows — tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60
_R = 1 << _HASH_BITS


def _hash60(value: Column, tag: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(tag), value)), 1, 15),
        16,
        10,
    ).cast("long")


def kmins_signature(
    df: DataFrame,
    value_col: str,
    strata: list[str] | None = None,
    k: int = 64,
    tag: str = "kmv-v1",
) -> DataFrame:
    """Per-stratum k-mins sketch ``(*strata, bucket, min_h,
    sample_value)`` — at most ``k`` rows per stratum, one bounded
    aggregate. NULL values are skipped (not elements of the set).
    ``sample_value`` is the value attaining the bucket minimum: a
    deterministic uniform sample over DISTINCT values."""
    if not 1 <= k <= 1 << 20:
        raise ValueError(f"k must be in [1, 2^20], got {k}")
    strata = strata or []
    h = _hash60(F.col(value_col), tag)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*strata, (h % k).cast("int").alias("bucket"), h.alias("h"),
                F.col(value_col).alias("v"))
        .groupBy(*strata, "bucket")
        .agg(
            F.min("h").alias("min_h"),
            F.min_by("v", "h").alias("sample_value"),
        )
    )


def kmins_merge(sig: DataFrame, strata: list[str] | None = None) -> DataFrame:
    """Union of sketches: min per (strata, bucket) — merging shard
    sketches equals sketching the concatenated shards exactly."""
    strata = strata or []
    return sig.groupBy(*strata, "bucket").agg(
        F.min("min_h").alias("min_h"),
        F.min_by("sample_value", "min_h").alias("sample_value"),
    )


def kmins_estimate(
    sig: DataFrame,
    strata: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Collapse a sketch to one row per stratum: ``(*strata,
    present_buckets, min_sum, estimate)`` where ``min_sum`` is the
    exact BIGINT Σ min_h (empty buckets contribute R = 2^60; the sum is
    ≤ k·2^60 < 2^63 for k ≤ 8) and ``estimate = k²·R / min_sum − k`` —
    one IEEE division of exact integers. For k > 8 the sum can overflow
    BIGINT only when nearly all buckets are empty (n ≪ k, where the
    estimator is out of its regime anyway); the sum is computed in
    DECIMAL(38,0) exactness and cast once."""
    strata = strata or []
    agg = sig.groupBy(*strata).agg(
        F.count("*").cast("long").alias("present_buckets"),
        F.sum(F.col("min_h").cast("decimal(38,0)")).alias("__present_sum"),
    )
    min_sum = (
        F.col("__present_sum")
        + (F.lit(k) - F.col("present_buckets")).cast("decimal(38,0)")
        * F.lit(_R).cast("decimal(38,0)")
    )
    num = float(k) * float(k) * float(_R)
    return agg.select(
        *strata,
        "present_buckets",
        min_sum.cast("decimal(38,0)").alias("min_sum"),
        (F.lit(num) / min_sum.cast("double") - F.lit(float(k)))
        .alias("estimate"),
    )


def kmins_overlap(
    sig: DataFrame,
    strata: list[str],
    k: int = 64,
) -> DataFrame:
    """Pairwise stratum overlap from one-permutation MinHash: for each
    stratum pair (a < b), ``n_match`` = buckets where both minima exist
    and agree (an exact integer — the MinHash collision count),
    ``n_both`` = buckets present in both, and ``jaccard_est =
    n_match / n_both`` — one IEEE division of exact integers. The join
    runs on |strata|·k sketch rows, never corpus data."""
    if len(strata) != 1:
        raise ValueError("kmins_overlap takes exactly one stratum column")
    s = strata[0]
    a = sig.select(F.col(s).alias("stratum_a"), "bucket",
                   F.col("min_h").alias("ha"))
    b = sig.select(F.col(s).alias("stratum_b"), "bucket",
                   F.col("min_h").alias("hb"))
    pairs = a.join(b, "bucket").filter(F.col("stratum_a") < F.col("stratum_b"))
    return (
        pairs.groupBy("stratum_a", "stratum_b")
        .agg(
            F.count("*").cast("long").alias("n_both"),
            F.sum((F.col("ha") == F.col("hb")).cast("long")).alias("n_match"),
        )
        .select(
            "stratum_a", "stratum_b", "n_both", "n_match",
            (F.col("n_match").cast("double") / F.col("n_both").cast("double"))
            .alias("jaccard_est"),
        )
    )
