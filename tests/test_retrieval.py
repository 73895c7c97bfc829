"""BM25 retrieval, vocabulary, funnel, and cohort operators.

Small hand-computable corpora pin the scoring math; plan-shape checks pin
the scale story (broadcast query terms, no row-Python, bounded shuffles).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.operators.retrieval import (
    bm25_topk,
    doc_lengths,
    postings,
    vocab_stats,
)
from quickstart_streaming_agents_spark.plans import (
    assert_no_row_python,
    physical_plan,
)
from quickstart_streaming_agents_spark.queries import QUERIES

from .conftest import SF_DIR


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple apple apple durian"),
            (4, "elderberry"),
        ],
        ["doc_id", "text"],
    )


def test_postings_and_lengths(spark):
    post = postings(_docs(spark))
    rows = {(r.doc_id, r.term): r.tf for r in post.collect()}
    assert rows[(1, "apple")] == 2
    assert rows[(3, "apple")] == 3
    assert rows[(2, "cherry")] == 1
    dl = {r.doc_id: r.dl for r in doc_lengths(post).collect()}
    assert dl == {1: 3, 2: 2, 3: 4, 4: 1}


def test_bm25_manual_score(spark):
    # one query, one term: verify the exact Okapi number for doc 3
    q = spark.createDataFrame([("q", "apple")], ["query_id", "query_text"])
    out = {r.doc_id: r.score for r in bm25_topk(_docs(spark), q, k=10).collect()}
    # N=4 docs, df(apple)=2, avgdl=2.5; doc3: tf=3, dl=4
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    expected = idf * 3 * 2.2 / (3 + 1.2 * (1 - 0.75 + 0.75 * 4 / 2.5))
    assert abs(out[3] - round(expected, 6)) < 1e-9
    assert set(out) == {1, 3}  # only docs containing the term score


def test_bm25_rank_and_k(spark):
    q = spark.createDataFrame([("q", "apple banana")], ["query_id", "query_text"])
    out = bm25_topk(_docs(spark), q, k=2).orderBy("rank").collect()
    assert len(out) == 2
    assert [r.rank for r in out] == [1, 2]
    # rank 1 strictly outscores (or ties with lower doc_id than) rank 2
    assert (out[0].score, -out[0].doc_id) >= (out[1].score, -out[1].doc_id)


def test_bm25_rarer_term_wins(spark):
    # 'durian' (df=1) must outscore 'apple' (df=2) at equal tf/dl
    docs = spark.createDataFrame(
        [(1, "apple pear"), (2, "durian pear"), (3, "apple lime")],
        ["doc_id", "text"],
    )
    q = spark.createDataFrame(
        [("qa", "apple"), ("qd", "durian")], ["query_id", "query_text"]
    )
    out = bm25_topk(docs, q, k=1)
    top = {r.query_id: r for r in out.collect()}
    assert top["qd"].score > top["qa"].score


def test_vocab_stats_order_and_idf(spark):
    out = vocab_stats(_docs(spark), top_n=2).collect()
    # apple: df=2 cf=5; banana: df=2 cf=2 -> df ties break on term asc
    assert [r.term for r in out] == ["apple", "banana"]
    assert (out[0].df, out[0].cf) == (2, 5)
    assert abs(out[0].idf - round(math.log(1 + 2.5 / 2.5), 6)) < 1e-9


def test_bm25_plan_broadcasts_query_side(spark):
    docs = QUERIES["bm25_search"](spark, SF_DIR)
    plan = physical_plan(docs)
    assert "BroadcastHashJoin" in plan  # query terms/stats never shuffle docs
    assert_no_row_python(docs)


def test_event_funnel_stages(spark):
    out = QUERIES["event_funnel"](spark, SF_DIR)
    rows = out.collect()
    assert rows, "funnel should produce at least one viewing user"
    for r in rows:
        # ordering invariants of a sequential funnel
        if r.t_click is not None:
            assert r.t_click >= r.t_view
        if r.t_purchase is not None:
            assert r.t_click is not None and r.t_purchase >= r.t_click
        assert r.stage == (3 if r.t_purchase else 2 if r.t_click else 1)
    assert_no_row_python(out)


def test_cohort_retention_monotone(spark):
    out = QUERIES["cohort_retention"](spark, SF_DIR)
    rows = out.collect()
    assert rows
    # offset-0 cell of each cohort counts every user of that cohort, so no
    # later offset may exceed it
    base = {
        r.cohort_week: r.n_users for r in rows if r.week_offset == 0
    }
    for r in rows:
        assert r.week_offset >= 0
        assert r.n_users <= base[r.cohort_week]


def test_funnel_handcrafted(spark):
    ev = spark.createDataFrame(
        [
            # u1 completes the funnel; u2 clicks before any view (no click
            # counted); u3 views only
            (1, "2024-01-01 00:00:00", "view"),
            (1, "2024-01-01 00:01:00", "click"),
            (1, "2024-01-01 00:02:00", "purchase"),
            (2, "2024-01-01 00:00:30", "click"),
            (2, "2024-01-01 00:01:30", "view"),
            (3, "2024-01-01 00:00:10", "view"),
        ],
        ["user_id", "ts_s", "event_type"],
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_type",
             F.lit(0.0).alias("value"), F.lit("{}").alias("props"),
             F.lit(0).alias("event_id"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.select("event_id", "ts", "user_id", "event_type", "value", "props") \
            .write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {r.user_id: r for r in QUERIES["event_funnel"](spark, d).collect()}
    assert out[1].stage == 3
    assert out[2].stage == 1  # click precedes first view -> not counted
    assert out[3].stage == 1


def test_broadcast_scorer_matches_distributed(spark):
    """bm25_search_broadcast (precomputed index, map-only) must emit
    exactly the distributed bm25_topk rows on the fixture corpus."""
    from quickstart_streaming_agents_spark.operators.retrieval import (
        bm25_search_broadcast,
        build_bm25_index,
    )
    from quickstart_streaming_agents_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    queries = spark.createDataFrame(
        [("qa", "spark hash join"), ("qb", "window agg merge"),
         ("qc", "value row fast")],
        ["query_id", "query_text"],
    )
    index = build_bm25_index(docs)
    got = {
        (r.query_id, r.doc_id, r.rank, r.score)
        for r in bm25_search_broadcast(queries, index, k=7).collect()
    }
    want = {
        (r.query_id, r.doc_id, r.rank, r.score)
        for r in bm25_topk(docs, queries, k=7).collect()
    }
    assert got == want and len(got) == 21


def test_broadcast_scorer_size_guard(spark):
    from quickstart_streaming_agents_spark.operators.retrieval import (
        bm25_search_broadcast,
        build_bm25_index,
    )

    index = build_bm25_index(_docs(spark))
    q = spark.createDataFrame([("q", "apple")], ["query_id", "query_text"])
    try:
        bm25_search_broadcast(q, index, max_broadcast_bytes=10)
        raise AssertionError("guard did not fire")
    except ValueError as e:
        assert "broadcast tier bound" in str(e)


def test_bm25_plan_reads_cached_index_once(spark):
    """The postings persist must hold: one real corpus scan, every other
    branch reading the in-memory index (a regression here re-scans and
    re-shuffles the corpus 4x)."""
    df = QUERIES["bm25_search"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "InMemoryTableScan" in plan


def test_bigram_backoff_paths_and_math(spark):
    """All three scoring paths (seen bigram, backoff, OOV unigram) fire
    and match an independent Python reference on a crafted profile/score
    split."""
    import math

    from pyspark.sql import Row

    from quickstart_streaming_agents_spark.operators.retrieval import (
        bigram_backoff_logprob,
    )

    profile = spark.createDataFrame([
        Row(doc_id=0, text="a b a b c"),
        Row(doc_id=2, text="a b c a"),
    ])
    scored = spark.createDataFrame([
        Row(doc_id=1, text="a b c"),    # all bigrams seen
        Row(doc_id=3, text="c b a"),    # 'c b' unseen -> backoff
        Row(doc_id=5, text="a zz b"),   # OOV word 'zz' both directions
    ])
    out = {r.doc_id: r for r in bigram_backoff_logprob(
        scored, profile).collect()}

    # profile counts: a=4, b=3, c=2, N=9; bigrams: ab=3, ba=1, bc=2, ca=1
    N = 9.0
    uni = {"a": 4, "b": 3, "c": 2}
    big = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 2, ("c", "a"): 1}

    def ref(toks):
        lps, bo = [], 0
        for i, w in enumerate(toks):
            cw = uni.get(w, 0.5)
            if i == 0:
                lps.append(math.log(cw / N))
            elif (toks[i - 1], w) in big:
                lps.append(math.log(
                    big[(toks[i - 1], w)] / uni[toks[i - 1]]))
            else:
                bo += 1
                lps.append(math.log(0.4) + math.log(cw / N))
        return sum(lps) / len(lps), bo

    for doc_id, text in [(1, "a b c"), (3, "c b a"), (5, "a zz b")]:
        want_avg, want_bo = ref(text.split())
        r = out[doc_id]
        assert r.n_backoff == want_bo, (doc_id, r.n_backoff, want_bo)
        assert abs(r.avg_logprob - want_avg) < 1e-6, (doc_id,)
    assert out[1].n_backoff == 0
    assert out[3].n_backoff == 1  # 'c b' unseen ('b a' IS in profile)
    assert out[5].n_backoff == 2  # 'a zz' and 'zz b' both back off


def test_token_entropy_orders_repetition_and_hits_uniform_bound(spark):
    """A chant-like doc must score below a diverse doc; a perfectly
    uniform doc must hit exactly ln(k) (the entropy maximum for k types,
    checked to the query's rounding); TTR is exact."""
    import math

    from pyspark.sql import Row

    from quickstart_streaming_agents_spark.operators.retrieval import (
        token_entropy,
    )

    docs = spark.createDataFrame([
        Row(doc_id=1, text="buy buy buy buy buy buy buy now"),
        Row(doc_id=2, text="eight distinct words appear exactly once here today"),
        Row(doc_id=3, text="a b c d a b c d"),  # uniform over 4 types
    ])
    out = {r.doc_id: r for r in token_entropy(docs).collect()}
    assert out[1].token_entropy < out[2].token_entropy
    assert abs(out[3].token_entropy - math.log(4)) < 1e-6
    assert out[2].type_token_ratio == 1.0
    assert out[1].distinct_tokens == 2 and out[1].n_tokens == 8


def test_phrase_search_slots_and_repeats(spark):
    """Occurrence counting: overlapping matches of a repeated-word
    phrase count each start; reversed word order never matches; a term
    present without its partner never matches; first_pos is 1-based."""
    from quickstart_streaming_agents_spark.operators.retrieval import (
        phrase_search,
    )

    df = spark.createDataFrame([
        (1, "the fast merge ran fast merge twice"),
        (2, "fast but no merge adjacency"),
        (3, "merge fast reversed"),
        (4, "aa aa aa"),
        (5, "fast merge fast merge"),
    ], ["doc_id", "text"])
    got = {(r.doc_id, r.phrase): (r.n_occurrences, r.first_pos)
           for r in phrase_search(df, ["fast merge", "aa aa"]).collect()}
    assert got == {
        (1, "fast merge"): (2, 2),
        (4, "aa aa"): (2, 1),        # overlapping starts 1 and 2
        (5, "fast merge"): (2, 1),
    }
    import pytest

    with pytest.raises(ValueError, match="phrases"):
        phrase_search(df, [])
    with pytest.raises(ValueError, match="phrases"):
        phrase_search(df, ["ok", "  "])


def test_phrase_search_duplicate_phrases_deduped(spark):
    """A phrase listed twice must not double its slot rows (which made
    __slots == 2*n_words and silently zeroed every occurrence) —
    ADVICE r10 regression."""
    from quickstart_streaming_agents_spark.operators.retrieval import (
        phrase_search,
    )

    df = spark.createDataFrame(
        [(1, "the fast merge ran")], ["doc_id", "text"]
    )
    got = {(r.doc_id, r.phrase): (r.n_occurrences, r.first_pos)
           for r in phrase_search(
               df, ["fast merge", "fast merge", "fast merge"]
           ).collect()}
    assert got == {(1, "fast merge"): (1, 2)}
