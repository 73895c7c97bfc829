"""Bucketed-table co-located joins: correctness + the zero-shuffle plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.sources.bucketed import (
    cobucket_join,
    write_bucketed,
)
from quickstart_streaming_agents_spark.sources.parquet import load_table

from .conftest import SF_DIR


def test_cobucket_join_no_exchange_and_correct(spark):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=8)
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", buckets=8)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = cobucket_join(spark, "b_lineitem", "b_orders",
                              "l_orderkey", "o_orderkey")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan  # both sides pre-shuffled on disk
            got = j.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        want = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert got == want

        # aggregation on the bucket key also skips the shuffle
        agg = spark.table("b_lineitem").groupBy("l_orderkey") \
            .agg(F.sum("l_quantity"))
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
