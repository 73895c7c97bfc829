"""Bucketed tables — pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact⋈fact join (orders ⋈ lineitem, events
⋈ events history) is shuffling both sides on the key for every query.
Bucketing pays that shuffle once at write time: both tables are
hash-partitioned into the same number of buckets on the join key and
sorted within buckets, so every later join/aggregation on that key is a
zero-Exchange sort-merge over co-located buckets
(tests/test_plans.py-style assertion in tests/test_bucketed.py).

The reference's analog is Kafka keyed partitioning: records partitioned by
message key give Flink co-located state access; bucketing is Spark's
storage-layer form of the same idea (ST5's PRIMARY KEY → key mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 64,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed (and bucket-sorted) managed table.

    ``buckets`` should be sized so one bucket of the largest table fits an
    executor's task comfortably (~128-512 MB compressed at scale); all
    tables meant to join each other must use the same bucket count.
    """
    spark = df.sparkSession
    # make re-runs idempotent even if a previous session left the managed
    # location behind without the catalog entry
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    import shutil
    from urllib.parse import urlparse

    base = urlparse(loc).path or loc
    # managed layout: <warehouse>[/<db>.db]/<lowercased table dir>
    parts = table.lower().split(".")
    sub = f"{parts[0]}.db/{parts[1]}" if len(parts) == 2 else parts[0]
    shutil.rmtree(f"{base}/{sub}", ignore_errors=True)
    w = df.write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cobucket_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key_left: str,
    key_right: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys — planner
    sees matching hash distributions and emits no Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right], how)
