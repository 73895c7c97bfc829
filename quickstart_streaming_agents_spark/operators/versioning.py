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

from pyspark.sql import DataFrame
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
