"""Decontamination semantics + broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import Row

from quickstart_streaming_agents_spark.operators.decontamination import (
    contamination_flags,
    decontaminate,
)
from quickstart_streaming_agents_spark.plans import physical_plan


def _corpus(spark):
    overlap = "the quick brown fox jumps over the lazy dog tonight"
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=f"intro words {overlap} closing words"),
            Row(doc_id=2, text="completely different content with no overlap at all here"),
            Row(doc_id=3, text="too short to shingle"),
            Row(doc_id=4, text=f"UPPER case copy: {overlap.upper()} trailing"),
        ]
    )


def _benchmark(spark):
    return spark.createDataFrame(
        [Row(text="benchmark question: the quick brown fox jumps over the lazy dog tonight answer")]
    )


def test_flags_overlapping_docs_case_insensitive(spark):
    out = {
        r.doc_id: (r.n_contaminated_ngrams, r.contaminated)
        for r in contamination_flags(
            _corpus(spark), _benchmark(spark), n=10
        ).collect()
    }
    assert out[1][1] is True and out[1][0] >= 1
    assert out[4][1] is True  # lowercasing catches the upper-case copy
    assert out[2] == (0, False)
    assert out[3] == (0, False)  # < n tokens -> never matches


def test_decontaminate_drops_only_contaminated(spark):
    kept = {r.doc_id for r in decontaminate(_corpus(spark), _benchmark(spark), n=10).collect()}
    assert kept == {2, 3}


def test_corpus_never_shuffles(spark):
    from quickstart_streaming_agents_spark.plans import count_exchanges

    df = contamination_flags(_corpus(spark), _benchmark(spark), n=10)
    plan = physical_plan(df)
    # both joins broadcast: shingle match AND the final flag attach
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # remaining exchanges touch only benchmark shingles (distinct) and the
    # matched-row count — never full corpus rows
    assert count_exchanges(df) <= 2, plan
