"""Sketch-based approximations vs exact answers.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are shuffle-heavy
or memory-unbounded; the scale path is HyperLogLog++
(`approx_count_distinct`) and KLL/GK quantile sketches
(`approx_percentile`) — single-pass, mergeable, bounded state. These
tests pin the engine's accuracy contract for that tier against the exact
tier on the fixtures, so swapping a dashboard to sketches is a measured
decision, not a leap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.sources.parquet import load_table

from .conftest import SF_DIR


def test_hll_distinct_within_rsd(spark):
    ev = load_table(spark, SF_DIR, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) <= max(3 * 0.05 * row.exact, 1.0), (
        row.exact,
        row.approx,
    )


def test_approx_percentile_within_tolerance(spark):
    ev = load_table(spark, SF_DIR, "events")
    row = ev.agg(
        F.percentile("value", F.lit(0.5)).alias("exact"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10_000)).alias("approx"),
    ).first()
    # accuracy=10000 → rank error ≤ n/10000; translate to a loose value
    # tolerance via the fixture's value spread
    spread = ev.agg((F.max("value") - F.min("value")).alias("s")).first().s
    assert abs(row.approx - row.exact) <= 0.05 * spread, (row.exact, row.approx)


def test_sketches_are_single_shuffle(spark):
    from quickstart_streaming_agents_spark.plans import count_exchanges

    ev = load_table(spark, SF_DIR, "events")
    df = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("users"),
        F.percentile_approx("value", F.lit(0.9), F.lit(1000)).alias("p90"),
    )
    # partial sketches merge map-side; one exchange moves only merged state
    assert count_exchanges(df) == 1


def test_cms_never_underestimates_and_collides_at_narrow_width(spark):
    """CMS point estimates are >= exact on EVERY term (the one-sided
    error guarantee), and a collision-heavy width actually produces
    over-estimates — proving the min-over-rows path is exercised, not
    just hash-identity at a roomy width."""
    from quickstart_streaming_agents_spark.operators.cms import (
        cms_cells,
        cms_estimate,
    )
    from quickstart_streaming_agents_spark.operators.retrieval import postings

    docs = load_table(spark, SF_DIR, "documents")
    post = postings(docs).persist()
    try:
        exact = post.groupBy("term").agg(
            F.sum("tf").cast("long").alias("exact_cf")
        )
        cells = cms_cells(post, "term", "tf", depth=2, width=32)
        est = cms_estimate(cells, exact, "term", depth=2, width=32)
        rows = est.collect()
        assert all(r.cms_est >= r.exact_cf for r in rows)
        assert any(r.cms_est > r.exact_cf for r in rows)  # collisions real
        total = sum(r.exact_cf for r in rows)
        # CM bound: err <= (e/width)*N per row at the given confidence;
        # assert the loose 3x version so the test pins accuracy, not luck
        import math

        bound = 3 * math.e / 32 * total
        assert all(r.cms_est - r.exact_cf <= bound for r in rows)
    finally:
        post.unpersist()


def test_cms_cells_bounded_and_single_shuffle(spark):
    """The sketch aggregate must collapse map-side: one exchange, and the
    finished sketch is capped at depth*width rows no matter the corpus."""
    from quickstart_streaming_agents_spark.operators.cms import cms_cells
    from quickstart_streaming_agents_spark.operators.retrieval import postings
    from quickstart_streaming_agents_spark.plans import count_exchanges

    docs = load_table(spark, SF_DIR, "documents")
    cells = cms_cells(postings(docs), "term", "tf", depth=4, width=64)
    assert count_exchanges(cells) <= 2  # postings agg + cells agg
    assert cells.count() <= 4 * 64
    plan = cells._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan.lower()  # map-side combine present


def test_hll_registers_merge_equals_whole(spark):
    """The HLL union property: sketching two shards and merging
    (max per bucket) must equal sketching the concatenated corpus —
    the distributed-aggregation contract that makes day-partition /
    shard sketches combinable at 100 TB."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.hll import (
        hll_merge,
        hll_registers,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        F.col("event_id").cast("string").alias("v")
    )
    whole = {(r.bucket, r.r) for r in hll_registers(ev, "v", p=8).collect()}
    a = hll_registers(ev.filter(F.crc32("v") % 2 == 0), "v", p=8)
    b = hll_registers(ev.filter(F.crc32("v") % 2 == 1), "v", p=8)
    merged = {
        (r.bucket, r.r)
        for r in hll_merge(a.unionByName(b)).collect()
    }
    assert merged == whole


def test_hll_estimate_accuracy_and_bounds(spark):
    """Raw estimate within the HLL error envelope (sigma = 1.04/sqrt(m)
    = 6.5% at m=256; assert the loose 4-sigma version so the test pins
    accuracy, not luck), duplicate values do not move the estimate
    (cardinality, not frequency), and p is validated."""
    import pytest
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.hll import (
        hll_estimate,
        hll_registers,
    )

    n = 5000
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    est = hll_estimate(hll_registers(df, "v", p=8), p=8).first()
    assert abs(est.estimate - n) / n < 4 * 1.04 / 16  # 4 sigma at m=256
    assert est.present_registers + est.zero_registers == 256

    # duplicates are invisible to a cardinality sketch
    dup = df.unionByName(df).unionByName(df)
    est_dup = hll_estimate(hll_registers(dup, "v", p=8), p=8).first()
    assert est_dup.harmonic_num == est.harmonic_num

    with pytest.raises(ValueError, match="p must be"):
        hll_registers(df, "v", p=2)


def test_hll_registers_bounded_and_partition_invariant(spark):
    """Register rows are capped at 2^p per stratum regardless of corpus
    size, the aggregate combines map-side, and the register table is
    identical under any input partitioning (exact integers, max-fold)."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.hll import (
        hll_registers,
    )
    from quickstart_streaming_agents_spark.plans import count_exchanges

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", F.col("event_id").cast("string").alias("v")
    )
    regs = hll_registers(ev, "v", strata=["event_type"], p=6)
    assert count_exchanges(regs) <= 1
    per = regs.groupBy("event_type").count().collect()
    assert all(r["count"] <= 64 for r in per)
    plan = regs._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan  # map-side combine present

    base = sorted(map(tuple, regs.collect()))
    for n_parts in (1, 7):
        again = hll_registers(
            ev.repartition(n_parts), "v", strata=["event_type"], p=6
        )
        assert sorted(map(tuple, again.collect())) == base


def test_hll_estimate_rejects_mismatched_p(spark):
    """ADVICE r10: registers built at p=10 estimated at p=8 must fail
    loudly (buckets >= 2^8 prove the mismatch), and the symmetric
    build-small/estimate-big direction must fail too (r can exceed the
    larger p's max rank), not silently emit wrong estimates."""
    import pytest

    from quickstart_streaming_agents_spark.operators.hll import (
        hll_estimate,
        hll_registers,
    )

    df = spark.range(5000).select((F.col("id") % 3000).cast("string").alias("v"))
    regs10 = hll_registers(df, "v", p=10)
    with pytest.raises(Exception, match="inconsistent with p=8"):
        hll_estimate(regs10, p=8).collect()
    # the r-bound side: a rank past the claimed field width proves the
    # registers came from a smaller build p
    regs_bad = spark.createDataFrame(
        [(0, 55), (1, 3)], "bucket INT, r INT"
    )
    with pytest.raises(Exception, match="inconsistent with p=12"):
        hll_estimate(regs_bad, p=12).collect()
    # matched p still estimates fine
    assert hll_estimate(regs10, p=10).count() == 1


def test_kmins_merge_equals_whole_and_bounded(spark):
    """k-mins union property: sketching two shards and merging (min per
    bucket) equals sketching the whole corpus; rows stay <= k per
    stratum; the sample value is the argmin (a real corpus element)."""
    from quickstart_streaming_agents_spark.operators.kmv import (
        kmins_merge,
        kmins_signature,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        F.col("event_id").cast("string").alias("v")
    )
    whole = {(r.bucket, r.min_h, r.sample_value)
             for r in kmins_signature(ev, "v", k=32).collect()}
    a = kmins_signature(ev.filter(F.crc32("v") % 2 == 0), "v", k=32)
    b = kmins_signature(ev.filter(F.crc32("v") % 2 == 1), "v", k=32)
    merged = {(r.bucket, r.min_h, r.sample_value)
              for r in kmins_merge(a.unionByName(b)).collect()}
    assert merged == whole
    assert len(whole) <= 32
    sample_vals = {r.sample_value
                   for r in kmins_signature(ev, "v", k=32).collect()}
    universe = {r.v for r in ev.select("v").distinct().collect()}
    assert sample_vals <= universe


def test_kmins_estimate_accuracy_and_duplicate_invisibility(spark):
    """Estimate within the k-mins error envelope (sigma ~ 1/sqrt(k);
    assert 4 sigma at k=64) and duplicates do not move any register."""
    from quickstart_streaming_agents_spark.operators.kmv import (
        kmins_estimate,
        kmins_signature,
    )

    n = 20000
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    sig = kmins_signature(df, "v", k=64)
    est = kmins_estimate(sig, k=64).first()
    assert abs(est.estimate - n) / n < 4 / 8  # 4 sigma at k=64

    dup = df.unionByName(df).unionByName(df)
    sig_dup = kmins_signature(dup, "v", k=64)
    assert (
        {(r.bucket, r.min_h) for r in sig.collect()}
        == {(r.bucket, r.min_h) for r in sig_dup.collect()}
    )


def test_kmins_overlap_calibration(spark):
    """MinHash overlap: identical strata estimate Jaccard 1.0, disjoint
    strata ~0, and a constructed 50% overlap lands within 4 sigma."""
    from quickstart_streaming_agents_spark.operators.kmv import (
        kmins_overlap,
        kmins_signature,
    )

    base = spark.range(6000)
    df = (
        base.select(F.lit("a").alias("s"), F.col("id").cast("string").alias("v"))
        .unionByName(base.select(
            F.lit("b").alias("s"), F.col("id").cast("string").alias("v")))
        .unionByName(base.select(
            F.lit("c").alias("s"),
            (F.col("id") + 1_000_000).cast("string").alias("v")))
        .unionByName(base.select(
            F.lit("d").alias("s"),
            # half shared with a/b, half private
            F.when(F.col("id") % 2 == 0, F.col("id"))
            .otherwise(F.col("id") + 2_000_000).cast("string").alias("v")))
    )
    sig = kmins_signature(df, "v", strata=["s"], k=64)
    got = {(r.stratum_a, r.stratum_b): r
           for r in kmins_overlap(sig, ["s"], k=64).collect()}
    assert got[("a", "b")].jaccard_est == 1.0
    assert got[("a", "c")].jaccard_est < 0.15
    # true J(a, d) = 3000 / 9000 = 1/3; sigma ~ sqrt(J(1-J)/k) ~ 0.059
    assert abs(got[("a", "d")].jaccard_est - 1 / 3) < 4 * 0.06


def test_kmins_plan_is_one_bounded_aggregate(spark):
    """The sketch is ONE shuffle (the groupBy with map-side partial
    min) — the 100 TB contract."""
    from quickstart_streaming_agents_spark.operators.kmv import (
        kmins_signature,
    )
    from tests.test_plans import count_exchanges

    df = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    assert count_exchanges(kmins_signature(df, "v", k=16)) == 1
