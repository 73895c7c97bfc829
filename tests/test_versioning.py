"""Snapshot diff (operators/versioning.py) — the oracle parity test pins
the fingerprint_col path; these cover the default xxhash64 path and the
include_unchanged switch."""

from __future__ import annotations

from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.operators.versioning import snapshot_diff


def _rows(df):
    return {
        (r.doc_id, r.status) for r in df.select("doc_id", "status").collect()
    }


def test_default_hash_path_classifies_all_three(spark):
    old = spark.createDataFrame(
        [(1, "alpha", "en"), (2, "beta", "en"), (3, "gamma", "de")],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [(1, "alpha", "en"), (2, "beta EDITED", "en"), (4, "delta", "en")],
        "doc_id long, text string, lang string",
    )
    got = _rows(snapshot_diff(old, new))
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}


def test_include_unchanged_and_content_cols(spark):
    old = spark.createDataFrame(
        [(1, "alpha", "v1"), (2, "beta", "v1")],
        "doc_id long, text string, rev string",
    )
    # rev changes but text doesn't; diffing on text only → unchanged
    new = spark.createDataFrame(
        [(1, "alpha", "v2"), (2, "beta2", "v2")],
        "doc_id long, text string, rev string",
    )
    got = _rows(
        snapshot_diff(old, new, content_cols=["text"], include_unchanged=True)
    )
    assert got == {(1, "unchanged"), (2, "changed")}
    fps = snapshot_diff(old, new, content_cols=["text"]).collect()
    assert all(
        r.old_fingerprint is not None and r.new_fingerprint is not None
        for r in fps
        if r.status == "changed"
    )


def test_null_fingerprints_classify_by_presence(spark):
    """A NULL fingerprint (NULL content) must not masquerade as a missing
    row: presence comes from the join sides, equality is null-safe."""
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(1, None), (2, "beta"), (3, None)], "doc_id long, text string"
    ).withColumn("fp", F.md5("text"))
    new = spark.createDataFrame(
        [(1, None), (2, None), (4, "delta")], "doc_id long, text string"
    ).withColumn("fp", F.md5("text"))
    got = _rows(snapshot_diff(old, new, fingerprint_col="fp"))
    # 1: NULL→NULL content = unchanged (excluded); 2: beta→NULL = changed;
    # 3 removed; 4 added — none of the NULLs read as added/removed.
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}


def test_content_cols_validated(spark):
    import pytest

    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        snapshot_diff(old, new, content_cols=["nope"])


def test_scd2_merge_chains_across_batches(spark):
    """Two successive merges: the second revision must close the version
    the first merge opened, while rows closed in batch 1 are untouched
    (they never rejoin). Reconstructing the corpus at each timestamp must
    give exactly the snapshot that was live then."""
    from quickstart_streaming_agents_spark.operators.versioning import scd2_merge

    def hist(rows):
        return spark.createDataFrame(
            rows, "doc_id long, fingerprint string, "
                  "valid_from timestamp, valid_to timestamp"
        )

    def snap(rows):
        return spark.createDataFrame(rows, "doc_id long, fingerprint string")

    h0 = hist([(1, "a1", None, None), (2, "b1", None, None)])
    h0 = h0.withColumn("valid_from", F.lit("2024-01-01").cast("timestamp"))

    # batch 1: doc 1 revised, doc 2 removed, doc 3 added
    h1 = scd2_merge(h0, snap([(1, "a2"), (3, "c1")]), "2024-02-01")
    # batch 2: doc 1 revised again, doc 3 unchanged, doc 2 comes back
    h2 = scd2_merge(h1, snap([(1, "a3"), (3, "c1"), (2, "b2")]), "2024-03-01")

    rows = {
        (r.doc_id, r.fingerprint): (
            str(r.valid_from)[:10], str(r.valid_to)[:10] if r.valid_to else None
        )
        for r in h2.collect()
    }
    assert rows == {
        (1, "a1"): ("2024-01-01", "2024-02-01"),
        (1, "a2"): ("2024-02-01", "2024-03-01"),
        (1, "a3"): ("2024-03-01", None),
        (2, "b1"): ("2024-01-01", "2024-02-01"),
        (2, "b2"): ("2024-03-01", None),
        (3, "c1"): ("2024-02-01", None),
    }

    # point-in-time reconstruction: live set at each batch boundary
    def live_at(h, t):
        tt = F.lit(t).cast("timestamp")
        return {
            (r.doc_id, r.fingerprint)
            for r in h.filter(
                (F.col("valid_from") <= tt)
                & (F.col("valid_to").isNull() | (F.col("valid_to") > tt))
            ).collect()
        }

    assert live_at(h2, "2024-01-15") == {(1, "a1"), (2, "b1")}
    assert live_at(h2, "2024-02-15") == {(1, "a2"), (3, "c1")}
    assert live_at(h2, "2024-03-15") == {(1, "a3"), (2, "b2"), (3, "c1")}
