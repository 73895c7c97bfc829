"""salted_join: result parity with a plain join, and the salted key shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.operators.skew import salted_join
from quickstart_streaming_agents_spark.sources.parquet import load_table

from .conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    lineitem = load_table(spark, SF_DIR, "lineitem")  # skewed side
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    got = salted_join(lineitem, orders, on=["l_orderkey"], salt=8)
    want = lineitem.join(orders, on="l_orderkey")
    assert got.count() == want.count()
    g = got.agg(F.sum("o_totalprice"), F.sum("l_extendedprice")).collect()[0]
    w = want.agg(F.sum("o_totalprice"), F.sum("l_extendedprice")).collect()[0]
    assert g == w
    assert "__salt" not in got.columns


def test_salted_join_spreads_hot_key(spark):
    # one logical key, many rows: with salt=8 the shuffle key (key, salt)
    # has 8 distinct values instead of 1
    hot = spark.range(10000).select(F.lit(1).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(1, "x")], ["k", "v"])
    out = salted_join(hot, dim, on=["k"], salt=8)
    assert out.count() == 10000
    from quickstart_streaming_agents_spark.operators.skew import SALT

    salted = hot.withColumn(
        SALT, F.pmod(F.xxhash64("k", "id"), F.lit(8))
    )
    assert salted.select(SALT).distinct().count() == 8
