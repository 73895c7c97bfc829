"""Deterministic sampling: partition-invariance, mixture targets, plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.operators.sampling import (
    hash_unit,
    hash_unit_sql,
    deterministic_sample,
    domain_mix,
    mix_rates,
    stratified_sample,
)
from quickstart_streaming_agents_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


def test_sample_is_partition_invariant(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = {r.doc_id for r in deterministic_sample(docs, ["doc_id"], 0.3).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(17), ["doc_id"], 0.3).collect()
    }
    assert a == b
    assert 0.15 < len(a) / docs.count() < 0.45


def test_salt_draws_independent_samples(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = {r.doc_id for r in deterministic_sample(docs, ["doc_id"], 0.5, "s1").collect()}
    b = {r.doc_id for r in deterministic_sample(docs, ["doc_id"], 0.5, "s2").collect()}
    assert a != b
    # nested fractions nest: fraction 0.2 ⊂ fraction 0.5 under one salt
    c = {r.doc_id for r in deterministic_sample(docs, ["doc_id"], 0.2, "s1").collect()}
    assert c <= a


def test_mix_rates_hits_target_mixture():
    counts = {"en": 1000, "de": 200, "zh": 100}
    rates = mix_rates(counts, {"en": 0.5, "de": 0.25, "zh": 0.25})
    kept = {s: counts[s] * rates[s] for s in counts}
    total = sum(kept.values())
    assert abs(kept["en"] / total - 0.5) < 1e-9
    assert abs(kept["zh"] / total - 0.25) < 1e-9
    assert max(rates.values()) <= 1.0  # downsample-only


def test_domain_mix_output_proportions(spark):
    docs = load_table(spark, SF_DIR, "documents")
    w = {"de": 0.2, "en": 0.2, "es": 0.2, "fr": 0.2, "zh": 0.2}
    out = (
        domain_mix(docs, "lang", w, ["doc_id"])
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    ns = {r.lang: r.n for r in out}
    total = sum(ns.values())
    # hash sampling is binomial around the target; 500-doc fixture → wide band
    for lang in w:
        assert abs(ns.get(lang, 0) / total - 0.2) < 0.1, ns


def test_stratified_sample_is_map_only(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        stratified_sample(docs, "lang", {"en": 0.5}, ["doc_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_hash_unit_distinct_identities_distinct_hashes(spark):
    """concat_ws silently skips NULLs and '|' is the separator — (a,NULL)
    vs (NULL,a) and ('a|b','c') vs ('a','b|c') must NOT collide."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("alice", None), (None, "alice"), ("a|b", "c"), ("a", "b|c")],
        "x string, y string",
    )
    vals = [r.h for r in df.select(hash_unit(["x", "y"], "s").alias("h")).collect()]
    assert len(set(vals)) == 4


def test_hash_unit_sql_replays_normalization(spark):
    """The DuckDB form must hash identically for NULLs, pipes, and
    backslashes — and quote-escape the salt."""
    import duckdb

    rows = [("alice", None), ("a|b", "c"), ("x\\y", "z"), ("plain", "7")]
    df = spark.createDataFrame(rows, "x string, y string")
    sv = [round(r.h, 12) for r in
          df.select(hash_unit(["x", "y"], "it's").alias("h")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x VARCHAR, y VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    dv = [round(r[0], 12) for r in
          con.execute(f"SELECT {hash_unit_sql(['x', 'y'], chr(105)+chr(116)+chr(39)+chr(115))} FROM t").fetchall()]
    assert sv == dv


def test_mix_rates_zero_weight_excludes_stratum():
    assert mix_rates({"en": 100, "zh": 50}, {"en": 1.0, "zh": 0.0}) == {
        "en": 1.0, "zh": 0.0,
    }


def test_temperature_allocation_flattens_and_sums_to_budget(spark):
    """alpha=0.5 must compress the head/tail weight ratio vs the
    proportional (alpha=1) mix while preserving the ordering, and the
    integer allocation must not exceed the budget (floor division) nor
    undershoot it by more than |strata| rounding units."""
    from quickstart_streaming_agents_spark.functions.text import token_count
    from quickstart_streaming_agents_spark.operators.sampling import (
        temperature_allocation,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "lang", token_count("text").alias("nt")
    )
    budget = 1_000_000
    rows = {
        r.lang: r
        for r in temperature_allocation(
            docs, "lang", "nt", budget=budget
        ).collect()
    }
    toks = {k: r.n_tokens for k, r in rows.items()}
    hi, lo = max(toks, key=toks.get), min(toks, key=toks.get)
    w = {k: r.weight for k, r in rows.items()}
    assert w[hi] == max(w.values()) and w[lo] == min(w.values())
    # sqrt temperature compresses the ratio toward 1
    assert 1 < w[hi] / w[lo] < toks[hi] / toks[lo]
    total = sum(r.target_tokens for r in rows.values())
    assert budget - len(rows) * 2 <= total <= budget
    for r in rows.values():
        assert abs(r.epochs - r.target_tokens / r.n_tokens) < 1e-6


def test_temperature_allocation_single_corpus_exchange(spark):
    """The corpus contributes ONE partial aggregate; the window/division
    arithmetic runs on the |strata|-row frame only."""
    from quickstart_streaming_agents_spark.functions.text import token_count
    from quickstart_streaming_agents_spark.operators.sampling import (
        temperature_allocation,
    )
    from quickstart_streaming_agents_spark.plans import count_exchanges

    docs = load_table(spark, SF_DIR, "documents").select(
        "lang", token_count("text").alias("nt")
    )
    df = temperature_allocation(docs, "lang", "nt", budget=1000)
    # stratum agg + the single-partition window collapse on agg output
    assert count_exchanges(df) <= 2


def test_weighted_sample_topk_bias_determinism_and_guard(spark):
    """Heavier rows must win far more top-k slots than light rows under
    the fixed-point priority; the selection is identical across runs
    and partitioning; weight < 1 raises."""
    import pytest

    from quickstart_streaming_agents_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(i, "s", 100 if i % 2 == 0 else 1) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "stratum", "w"])
    got = weighted_sample_topk(df, "stratum", "w", k=50,
                               id_cols=["doc_id"]).collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r.w == 100)
    assert heavy >= 45  # weight-100 rows should dominate the top-50
    assert [r.rank for r in sorted(got, key=lambda r: r.rank)] == list(
        range(1, 51))
    # determinism across partitioning
    again = weighted_sample_topk(df.repartition(13), "stratum", "w", k=50,
                                 id_cols=["doc_id"]).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in got}
    with pytest.raises(ValueError, match="k must"):
        weighted_sample_topk(df, "stratum", "w", k=0, id_cols=["doc_id"])
    bad = spark.createDataFrame([(1, "s", 0)], ["doc_id", "stratum", "w"])
    with pytest.raises(Exception, match="must be >= 1"):
        weighted_sample_topk(bad, "stratum", "w", k=1,
                             id_cols=["doc_id"]).collect()
