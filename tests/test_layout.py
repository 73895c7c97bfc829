"""Z-order layout (operators/layout.py): key correctness against an
independent Python interleave, input validation, and the property the
layout exists for — per-partition bounding boxes tight in BOTH
dimensions, unlike a single-column sort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.operators.layout import (
    zorder_repartition,
    zvalue,
)


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zvalue_matches_independent_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 1023) for y in (0, 2, 700, 1023)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.z for r in df.select(
        "x", "y", zvalue(["x", "y"], bits=10).alias("z")
    ).collect()}
    for (x, y), z in got.items():
        assert z == _morton(x, y, 10), (x, y)
    # monotone upper corner: all-ones interleave
    assert got[(1023, 1023)] == (1 << 20) - 1


def test_zvalue_validation():
    with pytest.raises(ValueError, match="62-bit"):
        zvalue(["a", "b", "c"], bits=21)
    with pytest.raises(ValueError, match="at least one"):
        zvalue([])


def test_zorder_partitions_bound_both_dims(spark):
    """The point of the layout: range-partitioning the Morton key
    keeps every partition's bounding box small in BOTH x and y; a
    plain sort on x alone leaves y unbounded (full-range) in every
    partition. Measured as the summed bounding-box area over 16
    partitions on a deterministic 64x64 grid."""
    rows = [(x * 64 + y, x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    def area(frame):
        boxed = frame.withColumn("p", F.spark_partition_id()).groupBy(
            "p"
        ).agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        return sum((r.dx + 1) * (r.dy + 1) for r in boxed.collect())

    z_area = area(zorder_repartition(df, ["x", "y"], bits=6,
                                     num_partitions=16))
    x_area = area(df.repartitionByRange(16, "x"))
    # 16 z-partitions of a 64x64 grid ≈ 16x16 tiles (area 16*256=4096);
    # x-only partitions are 4-wide, 64-tall stripes (area 16*4*64=4096
    # in the best case but y is ALWAYS full-range). Assert both the
    # absolute z bound and the relative y-spread win.
    assert z_area <= 4 * 16 * 16 * 16, z_area
    zy = zorder_repartition(df, ["x", "y"], bits=6, num_partitions=16)
    max_dy = max(
        r.dy for r in zy.withColumn("p", F.spark_partition_id())
        .groupBy("p").agg((F.max("y") - F.min("y")).alias("dy")).collect()
    )
    max_dy_x = max(
        r.dy for r in df.repartitionByRange(16, "x")
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").agg((F.max("y") - F.min("y")).alias("dy")).collect()
    )
    assert max_dy < max_dy_x == 63  # x-sort leaves y full-range
