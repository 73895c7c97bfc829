"""hits_int / readability_counts / tfidf_top_terms unit pins — each
checked against an independent reimplementation (the pagerank_int
test convention), not against their own oracles."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.functions.text import (
    readability_counts,
)
from quickstart_streaming_agents_spark.operators.components import hits_int
from quickstart_streaming_agents_spark.operators.retrieval import (
    tfidf_top_terms,
)


def _hits_ref(edges, nodes, iters=2, scale=1_000_000):
    """Independent integer HITS (plain dict arithmetic)."""
    hubs = {v: scale for v in nodes}
    auths = {}
    for _ in range(iters):
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[d] += hubs[s]
        tot = max(sum(raw.values()), 1)
        auths = {v: r * scale // tot for v, r in raw.items()}
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[s] += auths[d]
        tot = max(sum(raw.values()), 1)
        hubs = {v: r * scale // tot for v, r in raw.items()}
    return auths, hubs


def test_hits_matches_independent_reference(spark):
    # star + chain + dangling node: 0→1, 0→2, 3→1, 2→3; node 4 isolated
    edges = [(0, 1), (0, 2), (3, 1), (2, 3)]
    nodes = [0, 1, 2, 3, 4]
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(v,) for v in nodes], "node long")
    got = {r["node"]: (r["authority_scaled"], r["hub_scaled"])
           for r in hits_int(e, n, iters=2).collect()}
    a_ref, h_ref = _hits_ref(edges, nodes)
    assert got == {v: (a_ref[v], h_ref[v]) for v in nodes}
    # the hub of hubs is node 0; best authority is node 1
    assert max(got, key=lambda v: got[v][1]) == 0
    assert max(got, key=lambda v: got[v][0]) == 1
    # isolated node scores (0, 0)
    assert got[4] == (0, 0)


def test_hits_edgeless_graph_is_all_zero_not_error(spark):
    n = spark.createDataFrame([(1,), (2,)], "node long")
    e = spark.createDataFrame([], "src long, dst long")
    rows = hits_int(e, n, iters=1).collect()
    assert {(r["authority_scaled"], r["hub_scaled"]) for r in rows} == {(0, 0)}


def test_readability_counts_hand_computed(spark):
    text = "The quick brown fox. It jumps! Done?"
    df = spark.createDataFrame([(text,)], "text string")
    c = readability_counts("text")
    row = df.select(*[v.alias(k) for k, v in c.items()]).collect()[0]
    assert row["n_words"] == 7
    assert row["n_sentences"] == 3
    # syllable groups: e,ui,o,o,(fox:o),I,u,(jumps:u)... count vowel runs
    syl = 0
    run = False
    for ch in text.lower():
        if ch in "aeiouy":
            syl += 0 if run else 1
            run = True
        else:
            run = False
    assert row["n_syllables"] == syl
    expected = 206835 - (1015 * 7) // 3 - (84600 * syl) // 7
    assert row["flesch_e3"] == expected


def test_readability_empty_text_defined(spark):
    df = spark.createDataFrame([("",), ("   ",)], "text string")
    c = readability_counts("text")
    for row in df.select(*[v.alias(k) for k, v in c.items()]).collect():
        assert row["n_words"] == 0
        assert row["n_sentences"] == 1
        assert row["flesch_e3"] == 206835  # defined, flagged by n_words=0


def test_tfidf_top_terms_rare_term_wins(spark):
    docs = spark.createDataFrame(
        [(1, "common rare common"), (2, "common common"),
         (3, "common other")],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["rank"]): (r["term"], r["score"])
           for r in tfidf_top_terms(docs, k=2).collect()}
    # doc 1: 'rare' (df=1) must outrank 'common' (df=3) despite tf 1 vs 2
    n, df_rare, df_common = 3, 1, 3
    idf = lambda df_: math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
    assert out[(1, 1)][0] == "rare"
    assert out[(1, 1)][1] == pytest.approx(round(idf(df_rare), 6))
    assert out[(1, 2)][0] == "common"
    assert out[(1, 2)][1] == pytest.approx(round(2 * idf(df_common), 6))


def test_tfidf_tie_breaks_by_term_asc(spark):
    docs = spark.createDataFrame(
        [(1, "beta alpha"), (2, "beta alpha")], "doc_id long, text string"
    )
    rows = tfidf_top_terms(docs, k=2).filter(F.col("doc_id") == 1).collect()
    assert [r["term"] for r in sorted(rows, key=lambda r: r["rank"])] == [
        "alpha", "beta"
    ]


def test_hits_rejects_non_positive_iters(spark):
    """ADVICE r11: iters=0 left auths=None and crashed with
    AttributeError at the final join — validate at entry instead."""
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    n = spark.createDataFrame([(0,), (1,)], "node long")
    for bad in (0, -3):
        with pytest.raises(ValueError, match="iters"):
            hits_int(e, n, iters=bad)


def test_meta_charset_whatwg_1024_byte_prescan(spark):
    """ADVICE r11: the WHATWG prescan examines only the first 1024
    bytes — a <meta charset> planted past that window must NOT match,
    while the same label inside the window must."""
    from quickstart_streaming_agents_spark.functions.text import meta_charset

    inside = "<html>" + "x" * 100 + '<meta charset="shift_jis">'
    outside = "<html>" + "x" * 1100 + '<meta charset="shift_jis">'
    df = spark.createDataFrame(
        [(1, inside), (2, outside)], "id long, html string"
    )
    got = {r["id"]: r["m"]
           for r in df.select("id", meta_charset("html").alias("m")).collect()}
    assert got == {1: "shift_jis", 2: None}
