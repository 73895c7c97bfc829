"""Physical-plan shape regression tests.

Correctness tests prove the answers right; these prove the *plans* stay
scale-worthy: filters pushed into scans, column-pruned reads, broadcast
joins for bounded dims, map-only stages where no shuffle is needed, and
exactly one shuffle for keyed window aggregation. A regression here means
an operator silently became 100×-at-scale slower without failing any
correctness test.
"""

from __future__ import annotations

from quickstart_streaming_agents_spark.queries import QUERIES

from .conftest import SF_DIR


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "filter_project")
    # the user predicates (not just IsNotNull) are pushed into the scan
    assert "Not(EqualTo(event_type,error))" in plan.split("PushedFilters")[1][:300]


def test_column_pruning_on_fact_scan(spark):
    plan = _plan(spark, "pricing_summary")
    scan = plan.split("FileScan parquet ")[1]
    cols = scan.split("]")[0]
    # only the referenced lineitem columns are read, not all 16
    assert "l_comment" not in cols and "l_shipmode" not in cols
    assert "l_quantity" in cols


def test_three_way_join_broadcasts_small_sides(spark):
    plan = _plan(spark, "enriched_orders")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_interval_join_single_agg_shuffle(spark):
    plan = _plan(spark, "interval_join")
    # one shuffle for the window agg; the join side is broadcast at this SF
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan


def test_text_analysis_is_map_only(spark):
    plan = _plan(spark, "text_analysis")
    assert "Exchange" not in plan  # pure projection: no shuffle at any scale
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_tumble_agg_single_shuffle_with_partial_agg(spark):
    plan = _plan(spark, "tumble_5m_agg")
    assert plan.count("Exchange hashpartitioning") == 1
    # map-side partial aggregation before the shuffle
    assert plan.count("HashAggregate") >= 2


def test_no_cartesian_products_anywhere(spark):
    for name in QUERIES:
        plan = _plan(spark, name)
        if name == "counts_dashboard":
            continue  # four 1-row aggs crossed deliberately
        assert "CartesianProduct" not in plan, name


def test_no_row_at_a_time_python_anywhere(spark):
    # Python is allowed only as Arrow-batched pandas UDF / mapInPandas /
    # UDTF nodes — BatchEvalPython (pickled row-at-a-time) is banned.
    for name in QUERIES:
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
