"""Partition pruning — the other half of the 100 TB layout story.

sources/bucketed.py proves bucket co-location kills the join shuffle;
these prove the scan side: a date/key-partitioned fact table must hit
only the partitions a query needs, both statically (literal filter →
PartitionFilters on the scan) and dynamically (a filtered dimension
prunes fact partitions at runtime through the join — Spark's DPP).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.plans.inspect import physical_plan
from quickstart_streaming_agents_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def parted_events(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("parted") / "events_by_type")
    ev = load_table(spark, SF_DIR, "events")
    ev.write.partitionBy("event_type").parquet(out)
    return out


def test_static_partition_pruning(spark, parted_events):
    df = spark.read.parquet(parted_events).filter(
        F.col("event_type") == "purchase"
    )
    plan = physical_plan(df)
    assert "PartitionFilters" in plan and "purchase" in plan, plan
    # the non-partition columns are NOT in the partition filter path;
    # counts confirm only the one partition was read
    want = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert df.count() == want


def test_dynamic_partition_pruning_through_join(spark, parted_events):
    """A selective dim filter must reach the fact scan at runtime: the
    plan carries a dynamicpruning subquery on the partition column."""
    fact = spark.read.parquet(parted_events)
    dim = spark.createDataFrame(
        [("purchase", 1), ("signup", 2)], "event_type string, pri int"
    ).filter(F.col("pri") == 1)
    joined = fact.join(dim, "event_type")
    plan = physical_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    assert joined.count() == (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
