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
