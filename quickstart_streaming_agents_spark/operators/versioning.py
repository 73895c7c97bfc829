"""Corpus snapshot diff — dataset versioning between pipeline runs.

Beyond-reference surface: iterating on a training corpus means re-running
curation and asking "what actually changed since the last snapshot?" —
which documents appeared, disappeared, or were edited. This operator
computes the row-level diff of two snapshots keyed by document id,
comparing content fingerprints.

Spark-first plan: fingerprints are computed map-side (xxhash64 over the
content columns — no full-text comparison crosses the wire), then ONE
full-outer equi-join on the id. At 100 TB both sides are big, so the
join shuffles both on the id — storing snapshots bucketed by id
(sources/bucketed.py) makes the diff exchange-free, which is the layout
a snapshot store should use anyway. The dominant `unchanged` class is
dropped before anything downstream sees it, so the output is
proportional to the churn, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
    include_unchanged: bool = False,
    fingerprint_col: str | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots: ``id_col``, ``status`` in
    {'added', 'removed', 'changed'} (plus 'unchanged' when asked),
    ``old_fingerprint``, ``new_fingerprint``.

    Content equality is fingerprint equality — xxhash64 of the content
    columns by default, so only (id, 8-byte hash) pairs reach the join.
    Pass ``fingerprint_col`` to diff on a fingerprint the caller already
    computed (e.g. ``functions.text.doc_fingerprint`` for an
    SQL-replayable md5). Presence on each side is tracked with explicit
    marker columns and fingerprints compare null-safely, so a NULL
    fingerprint (e.g. a NULL text column) still classifies correctly.
    """
    if content_cols is None:
        cols = [
            c for c in old.columns if c != id_col and c in set(new.columns)
        ]
        if fingerprint_col is None and not cols:
            raise ValueError(
                "snapshots share no content columns; pass content_cols"
            )
    else:
        cols = list(content_cols)
        missing = [
            c
            for c in cols
            if c not in old.columns or c not in new.columns
        ]
        if missing:
            raise ValueError(f"content columns missing from a snapshot: {missing}")

    def fp(df: DataFrame, alias: str, marker: str) -> DataFrame:
        key = (
            F.col(fingerprint_col)
            if fingerprint_col is not None
            else F.xxhash64(*[F.col(c) for c in cols])
        )
        return df.select(
            F.col(id_col), key.alias(alias), F.lit(True).alias(marker)
        )

    o = fp(old, "old_fingerprint", "__in_old")
    n = fp(new, "new_fingerprint", "__in_new")
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(
            ~F.col("old_fingerprint").eqNullSafe(F.col("new_fingerprint")),
            "changed",
        )
        .otherwise("unchanged")
    )
    out = joined.select(
        id_col,
        status.alias("status"),
        "old_fingerprint",
        "new_fingerprint",
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def scd2_merge(
    history: DataFrame,
    snapshot: DataFrame,
    batch_time,
    id_col: str = "doc_id",
    fingerprint_col: str = "fingerprint",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Merge a new corpus snapshot into a type-2 version history — the
    mutation counterpart of :func:`snapshot_diff` (dataset versioning:
    every document version is kept with its validity interval, so any
    past training set can be reconstructed as ``valid_from <= t <
    coalesce(valid_to, inf)``).

    ``history`` rows carry (id, fingerprint, valid_from, valid_to) with
    ``valid_to IS NULL`` marking current versions; ``snapshot`` carries
    (id, fingerprint) as of ``batch_time`` (a timestamp Column/literal).
    Result is the full updated history:

    - current row, id absent from snapshot  → closed at batch_time
    - current row, fingerprint changed      → closed + new current row
    - current row, fingerprint unchanged    → untouched
    - id new in snapshot                    → new current row
    - already-closed rows                   → untouched, never rejoined

    Plan: ONE full-outer equi-join on the id between the CURRENT slice
    and the snapshot (closed history is filtered out map-side and unioned
    back — it never crosses the wire). Only (id, fingerprint) pairs move;
    with both tables stored bucketed by id (sources/bucketed.py) the join
    is exchange-free. Output size = |history| + churn.
    """
    t = batch_time if isinstance(batch_time, Column) else F.lit(batch_time)
    t = t.cast("timestamp")

    cur = history.filter(F.col(valid_to_col).isNull())
    closed = history.filter(F.col(valid_to_col).isNotNull())

    o = cur.select(
        F.col(id_col),
        F.col(fingerprint_col).alias("__ofp"),
        F.col(valid_from_col).alias("__ovf"),
        F.lit(True).alias("__in_old"),
    )
    n = snapshot.select(
        F.col(id_col),
        F.col(fingerprint_col).alias("__nfp"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, id_col, "full_outer")
    gone_or_changed = F.col("__in_new").isNull() | ~F.col("__ofp").eqNullSafe(
        F.col("__nfp")
    )
    old_keep = j.filter(F.col("__in_old").isNotNull()).select(
        F.col(id_col),
        F.col("__ofp").alias(fingerprint_col),
        F.col("__ovf").alias(valid_from_col),
        F.when(gone_or_changed, t).alias(valid_to_col),
    )
    new_rows = j.filter(
        F.col("__in_new").isNotNull()
        & (F.col("__in_old").isNull() | ~F.col("__ofp").eqNullSafe(F.col("__nfp")))
    ).select(
        F.col(id_col),
        F.col("__nfp").alias(fingerprint_col),
        t.alias(valid_from_col),
        F.lit(None).cast("timestamp").alias(valid_to_col),
    )
    base = closed.select(id_col, fingerprint_col, valid_from_col, valid_to_col)
    return base.unionByName(old_keep).unionByName(new_rows)
