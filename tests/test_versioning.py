"""Snapshot diff (operators/versioning.py) — the oracle parity test pins
the fingerprint_col path; these cover the default xxhash64 path and the
include_unchanged switch."""

from __future__ import annotations

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
