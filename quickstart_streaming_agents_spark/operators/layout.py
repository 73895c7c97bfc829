"""Z-order (Morton) data layout for multi-dimension scan pruning.

Beyond-reference scale surface: at 100 TB, a table range-partitioned
and sorted on ONE column prunes scans only on that column; interleaving
the bits of k columns into a single Morton key and range-partitioning
on it keeps every partition's bounding box tight in ALL k dimensions,
so parquet min/max (and partition) pruning works for filters on any of
them — the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, built
here from public bit arithmetic (Morton 1966).

Everything is exact BIGINT bit manipulation (shiftleft/shiftright/&),
whole-stage-codegen JVM expressions — no UDF, no float, SQL-replayable
bit for bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` bits of each column:
    bit ``b`` of column ``i`` lands at position ``b·k + i``. Inputs
    must already be non-negative and < 2**bits (callers bucket or
    clamp first — out-of-range bits are silently masked, documented).
    k·bits must fit a signed BIGINT (≤ 62)."""
    k = len(cols)
    if k < 1:
        raise ValueError("zvalue needs at least one column")
    if k * bits > 62:
        raise ValueError(
            f"{k} columns x {bits} bits = {k * bits} exceeds the 62-bit "
            "signed-BIGINT budget; lower bits or bucket the columns"
        )
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(col, b).bitwiseAND(F.lit(1)), b * k + i
            )
    return z


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort the frame by its Morton key: every output
    partition covers a contiguous z-range, i.e. a small bounding box in
    every interleaved dimension — the write layout whose parquet
    min/max stats prune multi-dimensional filters. One range exchange
    (sampled bounds), in-partition sort, key dropped on return."""
    z = zvalue(cols, bits).alias("__z")
    out = df.withColumn("__z", z)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "__z")
    else:
        out = out.repartitionByRange("__z")
    return out.sortWithinPartitions("__z").drop("__z")
