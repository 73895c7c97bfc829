"""Count-min sketch (Cormode & Muthukrishnan 2005) — bounded-memory
frequency estimation for heavy-hitter detection.

Beyond-reference surface: the reference's counting queries (labs 1-3
dashboards) are exact aggregates; a 100 TB token/URL/user stream needs a
frequency tier whose state does NOT grow with the key cardinality. The
count-min sketch is that tier: ``depth`` hash rows of ``width`` counters,
point estimate = min over rows — always an over-estimate, never under,
with error ≤ (e/width)·N at confidence 1−exp(−depth).

Spark-first plan: each occurrence fans out to ``depth`` (row, bucket)
cells and one ``groupBy`` folds them — the aggregate has at most
``depth × width`` distinct keys, so partial aggregation collapses the
fan-out map-side and the shuffle carries ≤ depth·width rows **per task**
regardless of corpus size (the same bounded-state argument as
`approx_count_distinct`'s HLL, pinned in tests/test_sketches.py). The
finished sketch is a ≤ depth·width-row table, broadcast for estimation.

Hashing is the repo's deterministic md5→60-bit integer arithmetic
(`operators/sampling.py` uses the identical construction), so a DuckDB
oracle replays cells AND estimates exactly — the sketch is
integer-exact, not approximately-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(term: Column, row: int, width: int, tag: str = "cms-v1") -> Column:
    """Deterministic bucket for hash row ``row``: first 60 bits of
    md5(tag:row:term) mod width. Pure JVM expression; DuckDB replays it
    as ``('0x' || substr(md5(...), 1, 15))::UBIGINT % width``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(tag), F.lit(str(row)), term)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_cells(
    occurrences: DataFrame,
    term_col: str = "term",
    weight_col: str | None = None,
    *,
    depth: int = 4,
    width: int = 1024,
    tag: str = "cms-v1",
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` with ≤ depth·width rows.

    ``occurrences`` is one row per item (or per distinct item with an
    integer ``weight_col``, e.g. a postings table's ``tf``). The explode
    emits ``depth`` cells per input row; the groupBy's partial aggregate
    collapses them map-side into at most depth·width accumulators per
    task, so the exchange is O(depth·width·tasks) — bounded state at any
    corpus size.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    cells = occurrences.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("row"),
                        cms_bucket(F.col(term_col), j, width, tag).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
        w.alias("__w"),
    )
    return (
        cells.groupBy("c.row", "c.bucket")
        .agg(F.sum("__w").alias("cnt"))
        .select("row", "bucket", F.col("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    cells: DataFrame,
    probes: DataFrame,
    term_col: str = "term",
    *,
    depth: int = 4,
    width: int = 1024,
    tag: str = "cms-v1",
) -> DataFrame:
    """Point estimates for every probe term: ``probes`` + ``cms_est``.

    The sketch (≤ depth·width rows) is broadcast, so probing is map-only
    over the probe set — no shuffle of the probes. A probe whose bucket
    never received a count estimates 0 (only possible for terms absent
    from the sketched data).
    """
    keep = [c for c in probes.columns]
    pb = probes.select(
        *keep,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("row"),
                        cms_bucket(F.col(term_col), j, width, tag).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select(*keep, "c.row", "c.bucket")
    joined = pb.join(F.broadcast(cells), ["row", "bucket"], "left")
    return joined.groupBy(*keep).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cms_est")
    )
